"""Device-side YCbCr 4:2:0 -> RGB color conversion + host-side subsampling.

TPU-native analog of the reference's NVDEC color-convert split: the reference
decodes to NV12/P016 on the accelerator and converts YUV->RGB in a GPU kernel
(``/root/reference/packages/on_demand_video_decoder/ext_impl/src/
VideoCodecSDKUtils/helper_classes/Utils/ColorSpace.cu:123-283`` — the
``YuvToRgbKernel`` family processes 2x2 luma blocks sharing one chroma
sample, i.e. nearest-neighbor chroma upsampling, with a per-standard 3x3
matrix). Here the host ships planar Y + 2x2-subsampled CbCr (1.5 B/px instead
of 3 B/px RGB — JPEG and the video streams are natively 4:2:0, so no
information is lost relative to what the file contains) and the upsample +
matrix + clip fuse into the batched XLA preprocess program on device.

Works with numpy or jax.numpy inputs (same function serves host tests and the
jit-traced pipeline step).
"""

from __future__ import annotations

import numpy as np

from ._array_ns import xp_for as _xp_for

# Kr/Kb per standard (Kg = 1 - Kr - Kb)
_MATRIX_KR_KB = {
    "bt601": (0.299, 0.114),
    "bt709": (0.2126, 0.0722),
    "bt2020": (0.2627, 0.0593),  # non-constant-luminance (the common case)
}


def ycbcr_coefficients(matrix: str = "bt601", color_range: str = "full"):
    """Return ``(y_scale, y_offset, c_rr, c_gb, c_gr, c_bb)`` float32 scalars
    such that, with ``cb' = cb - 128`` and ``cr' = cr - 128``::

        yf = (y - y_offset) * y_scale
        r  = yf + c_rr * cr'
        g  = yf - c_gb * cb' - c_gr * cr'
        b  = yf + c_bb * cb'

    ``color_range="full"`` is the JPEG/JFIF convention (Y, C in [0, 255]);
    ``"limited"`` is the video convention (Y in [16, 235], C in [16, 240])
    matching the reference's ``ColorSpace.cu`` matrices.
    """
    try:
        kr, kb = _MATRIX_KR_KB[matrix]
    except KeyError:
        raise ValueError(
            f"matrix must be one of {sorted(_MATRIX_KR_KB)}, got {matrix!r}"
        ) from None
    kg = 1.0 - kr - kb
    if color_range == "full":
        y_scale, y_offset, c_scale = 1.0, 0.0, 1.0
    elif color_range == "limited":
        y_scale, y_offset, c_scale = 255.0 / 219.0, 16.0, 255.0 / 224.0
    else:
        raise ValueError(f"color_range must be 'full' or 'limited', got {color_range!r}")
    return tuple(
        np.float32(v)
        for v in (
            y_scale,
            y_offset,
            2.0 * (1.0 - kr) * c_scale,
            2.0 * kb * (1.0 - kb) / kg * c_scale,
            2.0 * kr * (1.0 - kr) / kg * c_scale,
            2.0 * (1.0 - kb) * c_scale,
        )
    )


def ycbcr420_to_rgb(y, cbcr, matrix: str = "bt601", color_range: str = "full"):
    """Convert planar Y + interleaved subsampled CbCr to uint8 RGB (HWC).

    Args:
        y: ``(..., H, W)`` uint8 luma plane (H, W even).
        cbcr: ``(..., H/2, W/2, 2)`` uint8 chroma, channel order (Cb, Cr).
        matrix: ``"bt601"`` (JPEG / SD video), ``"bt709"`` (HD video),
            or ``"bt2020"`` (UHD/HDR video, non-constant-luminance).
        color_range: ``"full"`` (JPEG) or ``"limited"`` (typical video).

    Chroma is upsampled nearest-neighbor (each 2x2 luma block shares one
    chroma sample), matching the reference GPU kernels' sampling
    (``ColorSpace.cu:123-199``). Returns ``(..., H, W, 3)`` uint8.
    """
    xp = _xp_for(y)
    ys, yo, c_rr, c_gb, c_gr, c_bb = ycbcr_coefficients(matrix, color_range)
    yf = (y.astype(np.float32) - yo) * ys
    cbf = cbcr[..., 0].astype(np.float32) - np.float32(128.0)
    crf = cbcr[..., 1].astype(np.float32) - np.float32(128.0)
    # nearest 2x upsample on the last two spatial axes
    cbf = xp.repeat(xp.repeat(cbf, 2, axis=-2), 2, axis=-1)
    crf = xp.repeat(xp.repeat(crf, 2, axis=-2), 2, axis=-1)
    r = yf + c_rr * crf
    g = yf - c_gb * cbf - c_gr * crf
    b = yf + c_bb * cbf
    rgb = xp.stack([r, g, b], axis=-1)
    rounded = xp.floor(rgb + np.float32(0.5))  # round-half-up, like the ref kernels
    return xp.clip(rounded, 0.0, 255.0).astype(np.uint8)


def subsample_chroma_420(ycbcr: np.ndarray):
    """Host-side split of a full-resolution YCbCr image into wire planes.

    Args:
        ycbcr: ``(H, W, 3)`` uint8, H and W even.

    Returns:
        ``(y, cbcr)``: ``(H, W)`` uint8 luma and ``(H/2, W/2, 2)`` uint8
        chroma, where each chroma sample is the rounded mean of its 2x2 block
        (the standard 4:2:0 box filter; JPEG/video chroma was stored at this
        resolution to begin with, so for decoded media this round-trips the
        file's own information content).
    """
    ycbcr = np.asarray(ycbcr, np.uint8)
    h, w, c = ycbcr.shape
    if c != 3:
        raise ValueError(f"expected (H, W, 3) YCbCr, got shape {ycbcr.shape}")
    if h % 2 or w % 2:
        raise ValueError(
            f"4:2:0 wire format needs even height/width, got {h}x{w} "
            "(pick an even decode/resize target)"
        )
    y = ycbcr[..., 0]
    c16 = ycbcr[..., 1:3].astype(np.uint16)
    cbcr = (
        c16[0::2, 0::2] + c16[1::2, 0::2] + c16[0::2, 1::2] + c16[1::2, 1::2] + 2
    ) >> 2
    return y, cbcr.astype(np.uint8)


def yuv420p_planes_to_wire(u: np.ndarray, v: np.ndarray):
    """Pack separate half-res U/V planes (video decoder I420 layout) into the
    interleaved ``(H/2, W/2, 2)`` CbCr wire array used on device."""
    return np.stack([np.asarray(u, np.uint8), np.asarray(v, np.uint8)], axis=-1)
