"""Device-side YCbCr 4:2:0 -> RGB conversion step.

The on-device half of the framework's NVDEC-style split (see
``accvlab_tpu.color``): :class:`ImageDecoder` with ``wire_format="yuv420"``
ships planar Y + subsampled CbCr over the host->device wire (1.5 B/px); this
step — placed as the first device step touching the image — fuses the chroma
upsample + color matrix + clip into the batched XLA preprocess program, so
downstream steps see the same uint8 HWC RGB (or BGR) they always did.

Parity anchor: the reference converts on the accelerator too
(``VideoCodecSDKUtils/helper_classes/Utils/ColorSpace.cu:227-283``).
"""

from __future__ import annotations

from typing import Union

from .pipeline_step_base import PipelineStepBase
from ..dtypes import DType
from ..sample_data_group import SampleDataGroup
from ...color import ycbcr420_to_rgb


class YCbCrToRGBConverter(PipelineStepBase):
    """Convert ``image_name`` (uint8 Y plane) + its ``<image_name>_cbcr``
    sibling (uint8 half-res CbCr) into a uint8 HWC RGB image, removing the
    chroma field.

    Must run before any step that expects an ``(H, W, 3)`` image. Defaults
    match the JPEG convention (BT.601 full-range); video frames typically
    need ``color_range="limited"`` (and ``matrix="bt709"`` for HD content) —
    the video reader APIs report the stream's values.
    """

    # "device", not "any": an "any" step ahead of the first device-placed
    # step would be folded into the HOST stage, converting to RGB before the
    # wire and forfeiting the 2x byte saving that is this step's purpose.
    placement = "device"

    def __init__(
        self,
        image_name: Union[str, int],
        matrix: str = "bt601",
        color_range: str = "full",
        as_bgr: bool = False,
    ):
        super().__init__()
        if not isinstance(image_name, str):
            raise ValueError("YCbCrToRGBConverter needs a string image_name")
        self._image_name = image_name
        self._chroma_name = f"{image_name}_cbcr"
        self._matrix = matrix
        self._color_range = color_range
        self._as_bgr = as_bgr
        # validate eagerly (construction time), not inside the trace
        from ...color import ycbcr_coefficients

        ycbcr_coefficients(matrix, color_range)

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        for ip in data.find_all_occurrences(self._image_name):
            parent = data.get_parent_of_path(list(ip))
            y = data.get_item_in_path(ip)
            cbcr = parent[self._chroma_name]
            rgb = ycbcr420_to_rgb(
                y, cbcr, matrix=self._matrix, color_range=self._color_range
            )
            if self._as_bgr:
                rgb = rgb[..., ::-1]
            parent.remove_field(self._chroma_name)
            data.set_item_in_path(ip, rgb)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        paths = data_empty.find_all_occurrences(self._image_name)
        if len(paths) == 0:
            raise KeyError(
                f"No occurrences of images found with name '{self._image_name}'."
            )
        for ip in paths:
            parent = data_empty.get_parent_of_path(list(ip))
            for name in (ip[-1], self._chroma_name):
                if not parent.path_exists(name):
                    raise KeyError(
                        f"YCbCrToRGBConverter expects a '{name}' field next to "
                        f"the image at {ip} (produced by ImageDecoder with "
                        "wire_format='yuv420')"
                    )
                t = parent.get_type_of_field(name)
                if t != DType.UINT8:
                    raise TypeError(f"Field '{name}' at {ip} must be UINT8, got {t}")
            parent.remove_field(self._chroma_name)
        return data_empty
