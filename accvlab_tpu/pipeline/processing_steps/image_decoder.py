"""Host-side image decoding step.

Parity: reference ``processing_steps/image_decoder.py:28`` (DALI
``fn.decoders.image``, mixed CPU/GPU with NVJPEG). TPU hosts have no
hardware JPEG decoder, so decoding runs on host workers (libjpeg-turbo via
PIL, which releases the GIL) — the ``use_device_mixed`` / ``hw_decoder_load``
parameters are accepted for API parity and ignored.
"""

from __future__ import annotations

import io
from typing import Union

import numpy as np

from .pipeline_step_base import PipelineStepBase
from ..dtypes import DType
from ..sample_data_group import SampleDataGroup


class ImageDecoder(PipelineStepBase):
    """Decode all encoded-image fields with a given name, in place.

    Input fields hold the encoded file bytes as uint8 tensors; outputs are
    decoded uint8 HWC images (RGB, or BGR with ``as_bgr=True``).
    """

    placement = "host"

    def __init__(
        self,
        image_name: Union[str, int],
        use_device_mixed: bool = False,
        hw_decoder_load: float = 0.65,
        as_bgr: bool = False,
        decode_scale_hint_hw=None,
    ):
        """``decode_scale_hint_hw``: optional (height, width) target. When the
        pipeline immediately resizes below the source resolution, libjpeg's
        DCT-domain scaling decodes directly at the nearest >= scale (2-4x
        faster on the host) — the same decode-resize fusion DALI's decoder
        offers on GPU. Downstream geometry must use the ORIGINAL image size
        (e.g. an `image_hw` metadata field), since the decoded array's pixel
        dimensions shrink."""
        super().__init__()
        self._image_name = image_name
        self._as_bgr = as_bgr
        self._scale_hint = tuple(decode_scale_hint_hw) if decode_scale_hint_hw else None
        del use_device_mixed, hw_decoder_load  # no NVJPEG on TPU hosts

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        from PIL import Image

        for ip in data.find_all_occurrences(self._image_name):
            encoded = np.asarray(data.get_item_in_path(ip), dtype=np.uint8)
            img = Image.open(io.BytesIO(encoded.tobytes()))
            if self._scale_hint is not None:
                img.draft("RGB", (self._scale_hint[1], self._scale_hint[0]))
            decoded = np.asarray(img.convert("RGB"), dtype=np.uint8)
            if self._as_bgr:
                decoded = decoded[..., ::-1]
            data.set_item_in_path(ip, decoded)
        return data

    def _check_and_adjust_data_format_input_to_output(
        self, data_empty: SampleDataGroup
    ) -> SampleDataGroup:
        paths = data_empty.find_all_occurrences(self._image_name)
        if len(paths) == 0:
            raise KeyError(
                f"No occurrences of images found. Fields containing images are "
                f"expected to have the name '{self._image_name}'."
            )
        for ip in paths:
            t = data_empty.get_type_of_item_in_path(ip)
            if t != DType.UINT8:
                raise TypeError(
                    f"Encoded image field at {ip} must be UINT8, got {t}"
                )
        return data_empty
