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

    For uniform-size JPEG sources on a wire-bound setup, consider the DCT
    coefficient wire instead (:class:`dct_wire.DCTWirePacker` — the host
    ships quantized coefficients and the device runs the IDCT; fewest
    host->device bytes AND least host CPU). This step is the general path:
    any format PIL decodes, mixed sources, and the ``yuv420`` pixel wire.
    """

    placement = "host"

    def __init__(
        self,
        image_name: Union[str, int],
        use_device_mixed: bool = False,
        hw_decoder_load: float = 0.65,
        as_bgr: bool = False,
        decode_scale_hint_hw=None,
        decode_resize_hw=None,
        wire_format: str = "rgb",
    ):
        """``decode_scale_hint_hw``: optional (height, width) target. When the
        pipeline immediately resizes below the source resolution, libjpeg's
        DCT-domain scaling decodes directly at the nearest >= scale (2-4x
        faster on the host) — the same decode-resize fusion DALI's decoder
        offers on GPU. Downstream geometry must use the ORIGINAL image size
        (e.g. an `image_hw` metadata field), since the decoded array's pixel
        dimensions shrink.

        ``decode_resize_hw``: optional (height, width) — fused decode+resize
        to EXACTLY this size (DCT scaling to the nearest >= scale, then one
        bilinear resample on host). This is the full analog of DALI's fused
        decoder+resize: it shrinks both the host->device transfer and the
        device program's working set to the output resolution. Use when the
        first device step resizes to a fixed size anyway (e.g.
        AffineTransformer STRETCH mode — which then sees an already-at-scale
        image and composes only the random augment on top). Geometry fields
        must key off the original size, as with the hint.

        ``wire_format``: ``"rgb"`` (default) decodes to uint8 HWC RGB on the
        host. ``"yuv420"`` stops host decoding at the JPEG's native colorspace
        — the image field becomes the planar uint8 Y luma ``(H, W)`` and a
        sibling field ``<image_name>_cbcr`` carries 2x2-subsampled uint8
        chroma ``(H/2, W/2, 2)`` — **1.5 B/px over the host->device wire
        instead of 3**, with the chroma upsample + BT.601 matrix fused into
        the device program by a :class:`YCbCrToRGBConverter` step (which must
        be the first device step touching the image). This is the TPU analog
        of the reference's NVDEC split, which ships NV12 and color-converts
        on the GPU (``ColorSpace.cu:227-283``); JPEG chroma is stored at this
        resolution anyway, so the wire carries the file's full information.
        Host decode is also cheaper: libjpeg emits YCbCr natively (PIL draft
        mode), skipping the host RGB conversion entirely. Requires a string
        ``image_name`` and an even ``decode_resize_hw``; odd decoded sizes
        (odd sources, DCT-scale-hint decodes) are edge-replicated by one
        row/column to even before subsampling."""
        super().__init__()
        if wire_format not in ("rgb", "yuv420"):
            raise ValueError(f"wire_format must be 'rgb' or 'yuv420', got {wire_format!r}")
        if wire_format == "yuv420":
            if as_bgr:
                raise ValueError(
                    "as_bgr with wire_format='yuv420': pass as_bgr to the "
                    "YCbCrToRGBConverter device step instead (the host never "
                    "produces RGB in this mode)"
                )
            if not isinstance(image_name, str):
                raise ValueError(
                    "wire_format='yuv420' needs a string image_name (the "
                    "chroma travels in a derived '<image_name>_cbcr' field)"
                )
            if decode_resize_hw is not None and (
                int(decode_resize_hw[0]) % 2 or int(decode_resize_hw[1]) % 2
            ):
                raise ValueError(
                    "wire_format='yuv420' needs an even decode_resize_hw "
                    f"(4:2:0 chroma is half-resolution), got {tuple(decode_resize_hw)}"
                )
        self._image_name = image_name
        self._as_bgr = as_bgr
        self._wire_format = wire_format
        self._scale_hint = tuple(decode_scale_hint_hw) if decode_scale_hint_hw else None
        self._resize_hw = tuple(decode_resize_hw) if decode_resize_hw else None
        del use_device_mixed, hw_decoder_load  # no NVJPEG on TPU hosts

    @property
    def chroma_field_name(self) -> str:
        return f"{self._image_name}_cbcr"

    def _set_yuv_fields(self, data, ip, y, cbcr):
        data.set_item_in_path(ip, y)
        parent = data.get_parent_of_path(list(ip))
        if not parent.path_exists(self.chroma_field_name):
            parent.add_data_field(self.chroma_field_name, DType.UINT8)
        parent[self.chroma_field_name] = cbcr

    def _try_native_yuv(self, data, ip, encoded) -> bool:
        """Fast path: the native libjpeg decoder (``pipeline/csrc/jpegdec.cpp``)
        decodes straight to the wire layout at the best M/8 DCT scale —
        measured 2.4x faster than the PIL path at the benchmark shape (PIL
        draft only exposes power-of-two scales, so a 1024->704 resize decodes
        at FULL size under PIL but at 6/8 natively) — and resamples chroma at
        half target resolution directly. Returns False to fall back to PIL
        (no libjpeg at build time, not a JPEG, or odd source dims without an
        explicit even resize target)."""
        from .. import native_jpeg

        if not native_jpeg.available():
            return False
        # JPEG magic: the field may hold PNG/BMP bytes (PIL handles those)
        if encoded.nbytes < 3 or encoded[0] != 0xFF or encoded[1] != 0xD8:
            return False
        try:
            target = self._resize_hw
            if target is None:
                target = native_jpeg.probe(encoded)
            if (target[0] | target[1]) & 1:
                return False
            y, cbcr = native_jpeg.decode_yuv420(encoded, target)
        except ValueError:
            return False
        self._set_yuv_fields(data, ip, y, cbcr)
        return True

    def _try_native_rgb(self, data, ip, encoded) -> bool:
        """RGB-wire fast path: native libjpeg decode at the best M/8 DCT
        scale straight to interleaved RGB/BGR (PIL draft only exposes
        power-of-two scales). Returns False to fall back to PIL (no libjpeg,
        not a JPEG, or an unconvertible source colorspace like CMYK)."""
        from .. import native_jpeg

        if not native_jpeg.available():
            return False
        if encoded.nbytes < 3 or encoded[0] != 0xFF or encoded[1] != 0xD8:
            return False
        try:
            if self._resize_hw is not None:
                target = self._resize_hw
            elif self._scale_hint is not None:
                # hint semantics: decode at the smallest DCT scale covering
                # the hint and KEEP that size (downstream geometry uses the
                # original-size metadata, as with the PIL draft path)
                target = native_jpeg.scaled_size(
                    native_jpeg.probe(encoded), self._scale_hint
                )
            else:
                target = native_jpeg.probe(encoded)
            decoded = native_jpeg.decode_rgb(encoded, target, self._as_bgr)
        except ValueError:
            return False
        data.set_item_in_path(ip, decoded)
        return True

    def _process(self, data: SampleDataGroup) -> SampleDataGroup:
        from PIL import Image

        yuv = self._wire_format == "yuv420"
        mode = "YCbCr" if yuv else "RGB"
        for ip in data.find_all_occurrences(self._image_name):
            encoded = np.asarray(data.get_item_in_path(ip), dtype=np.uint8)
            if yuv and self._scale_hint is None and self._try_native_yuv(
                data, ip, encoded
            ):
                continue
            if not yuv and self._try_native_rgb(data, ip, encoded):
                continue
            img = Image.open(io.BytesIO(encoded.tobytes()))
            target = self._resize_hw or self._scale_hint
            if target is not None:
                # draft: DCT-domain scaled decode straight to the target
                # colorspace (libjpeg decodes YCbCr natively — in yuv mode the
                # host RGB conversion is skipped entirely)
                img.draft(mode, (target[1], target[0]))
            if img.mode != mode:
                img = img.convert(mode)
            if self._resize_hw is not None and img.size != (
                self._resize_hw[1],
                self._resize_hw[0],
            ):
                img = img.resize(
                    (self._resize_hw[1], self._resize_hw[0]), Image.BILINEAR
                )
            decoded = np.asarray(img, dtype=np.uint8)
            if yuv:
                from ...color import subsample_chroma_420

                hgt, wid = decoded.shape[:2]
                if (hgt | wid) & 1:
                    # 4:2:0 needs even dims; odd sizes reach here from
                    # odd-dimension sources or DCT-scale-hint decodes
                    # (decode_resize_hw is validated even at construction).
                    # Edge-replicate one bottom row / right column: content
                    # preserved, chroma of the padded strip matches the
                    # border, and geometry keys off the original-size
                    # metadata field anyway.
                    decoded = np.pad(
                        decoded,
                        ((0, hgt & 1), (0, wid & 1), (0, 0)),
                        mode="edge",
                    )
                y, cbcr = subsample_chroma_420(decoded)
                self._set_yuv_fields(data, ip, y, cbcr)
            else:
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
            if self._wire_format == "yuv420":
                parent = data_empty.get_parent_of_path(list(ip))
                if parent.path_exists(self.chroma_field_name):
                    raise KeyError(
                        f"wire_format='yuv420' adds a '{self.chroma_field_name}' "
                        "field but one already exists"
                    )
                parent.add_data_field(self.chroma_field_name, DType.UINT8)
        return data_empty
