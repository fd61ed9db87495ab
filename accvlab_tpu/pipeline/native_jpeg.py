"""ctypes binding + lazy build of the native JPEG YCbCr 4:2:0 decoder.

See ``csrc/jpegdec.cpp``. Used by :class:`ImageDecoder` for
``wire_format="yuv420"`` with a fused resize target; falls back to the PIL
path when libjpeg headers/library are unavailable at build time.
"""

from __future__ import annotations

import ctypes
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERROR: Optional[str] = None


def _build_and_load() -> ctypes.CDLL:
    import os

    from accvlab_tpu._native_build import build_shared_lib

    src = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "csrc", "jpegdec.cpp"
    )
    lib = ctypes.CDLL(build_shared_lib(src, "libaccvlab_jpeg", ["-ljpeg"]))
    lib.ajd_last_error.restype = ctypes.c_char_p
    lib.ajd_probe.restype = ctypes.c_int
    lib.ajd_probe.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ajd_decode_yuv420.restype = ctypes.c_int
    lib.ajd_decode_yuv420.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.ajd_decode_rgb.restype = ctypes.c_int
    lib.ajd_decode_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.ajd_dct_info.restype = ctypes.c_int
    lib.ajd_dct_info.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ajd_read_dct.restype = ctypes.c_int
    lib.ajd_read_dct.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_uint16),
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The decoder library, built on first use; ``None`` if unavailable."""
    global _LIB, _LIB_ERROR
    if _LIB is not None or _LIB_ERROR is not None:
        return _LIB
    with _LIB_LOCK:
        if _LIB is None and _LIB_ERROR is None:
            try:
                _LIB = _build_and_load()
            except Exception as e:  # no libjpeg dev files: PIL fallback
                _LIB_ERROR = str(e)
    return _LIB


def available() -> bool:
    return get_lib() is not None


def probe(jpeg_bytes: np.ndarray) -> Tuple[int, int]:
    """Source (height, width) from the header, without decoding."""
    lib = get_lib()
    assert lib is not None
    buf = np.ascontiguousarray(jpeg_bytes, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.ajd_probe(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError(f"JPEG probe failed: {lib.ajd_last_error().decode()}")
    return h.value, w.value


def decode_yuv420(
    jpeg_bytes: np.ndarray, target_hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode straight to the wire layout at ``target_hw`` (even dims).

    Returns ``(y, cbcr)``: ``(H, W)`` uint8 and ``(H/2, W/2, 2)`` uint8.
    The decode runs at the best M/8 DCT scale >= target (arbitrary M — PIL
    draft only exposes powers of two), chroma is resampled at HALF target
    resolution directly, and no RGB conversion ever happens on the host.
    """
    lib = get_lib()
    assert lib is not None
    th, tw = int(target_hw[0]), int(target_hw[1])
    buf = np.ascontiguousarray(jpeg_bytes, np.uint8)
    y = np.empty((th, tw), np.uint8)
    cbcr = np.empty((th // 2, tw // 2, 2), np.uint8)
    rc = lib.ajd_decode_yuv420(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
        th, tw,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cbcr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"JPEG decode failed: {lib.ajd_last_error().decode()}")
    return y, cbcr


def decode_rgb(
    jpeg_bytes: np.ndarray, target_hw: Tuple[int, int], as_bgr: bool = False
) -> np.ndarray:
    """Decode to interleaved uint8 RGB/BGR at exactly ``target_hw``.

    Same M/8 DCT-scaled decode as :func:`decode_yuv420` — the RGB-wire
    analog (PIL draft only exposes power-of-two scales). Grayscale sources
    are expanded by libjpeg; CMYK raises ``ValueError`` (caller falls back
    to PIL)."""
    lib = get_lib()
    assert lib is not None
    th, tw = int(target_hw[0]), int(target_hw[1])
    buf = np.ascontiguousarray(jpeg_bytes, np.uint8)
    out = np.empty((th, tw, 3), np.uint8)
    rc = lib.ajd_decode_rgb(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
        th, tw, int(as_bgr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"JPEG decode failed: {lib.ajd_last_error().decode()}")
    return out


def dct_info(jpeg_bytes: np.ndarray) -> dict:
    """Header-only probe for the coefficient-domain ("DCT wire") read.

    Returns ``{"src_hw", "ncomp", "blocks_y", "blocks_c", "progressive"}``
    where the block grids are libjpeg's ``{height,width}_in_blocks`` (the
    chroma grid is the 4:2:0 one, synthesized for grayscale sources).
    Raises ``ValueError`` for colorspaces/samplings the DCT wire does not
    carry (anything but grayscale or YCbCr 4:2:0) — callers fall back to a
    pixel wire."""
    lib = get_lib()
    assert lib is not None
    buf = np.ascontiguousarray(jpeg_bytes, np.uint8)
    info = np.zeros(8, np.int32)
    rc = lib.ajd_dct_info(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
        info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError(f"DCT probe failed: {lib.ajd_last_error().decode()}")
    return {
        "src_hw": (int(info[0]), int(info[1])),
        "ncomp": int(info[2]),
        "blocks_y": (int(info[3]), int(info[4])),
        "blocks_c": (int(info[5]), int(info[6])),
        "progressive": bool(info[7]),
    }


def read_dct(jpeg_bytes: np.ndarray, m: int, info: Optional[dict] = None):
    """Entropy-decode only: the ``m x m`` top-left (natural-order) quantized
    coefficient subset of every block — exactly the subset libjpeg's own
    M/8 scaled decode uses — plus the quantization tables.

    Returns ``(y, cb, cr, quant)``: int16 ``(bh_y, bw_y, m, m)``, two int16
    ``(bh_c, bw_c, m, m)`` (all-zero for grayscale = neutral chroma after
    the IDCT level shift), and uint16 ``(2, m, m)`` (luma, chroma tables).
    """
    lib = get_lib()
    assert lib is not None
    if info is None:
        info = dct_info(jpeg_bytes)
    m = int(m)
    bh_y, bw_y = info["blocks_y"]
    bh_c, bw_c = info["blocks_c"]
    buf = np.ascontiguousarray(jpeg_bytes, np.uint8)
    y = np.zeros((bh_y, bw_y, m, m), np.int16)
    cb = np.zeros((bh_c, bw_c, m, m), np.int16)
    cr = np.zeros((bh_c, bw_c, m, m), np.int16)
    quant = np.zeros((2, m, m), np.uint16)
    rc = lib.ajd_read_dct(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.nbytes,
        m, bh_y, bw_y, bh_c, bw_c,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        cb.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        cr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        quant.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    if rc != 0:
        raise ValueError(f"DCT read failed: {lib.ajd_last_error().decode()}")
    return y, cb, cr, quant


def select_scale_m(source_hw: Tuple[int, int], target_hw: Tuple[int, int]) -> int:
    """The smallest M in 1..8 whose ceil(dim*M/8) covers ``target_hw`` on
    both axes — THE scale-selection rule, mirroring the C side
    (``jpegdec.cpp select_scale``); also used by the DCT wire to pick the
    shipped coefficient subset."""
    sh, sw = int(source_hw[0]), int(source_hw[1])
    th, tw = int(target_hw[0]), int(target_hw[1])
    for m in range(1, 9):
        if (sh * m + 7) // 8 >= th and (sw * m + 7) // 8 >= tw:
            return m
    return 8


def scaled_size(source_hw: Tuple[int, int], hint_hw: Tuple[int, int]) -> Tuple[int, int]:
    """The size libjpeg's best M/8 DCT scale produces for a scale-HINT
    decode (see :func:`select_scale_m`)."""
    sh, sw = int(source_hw[0]), int(source_hw[1])
    m = select_scale_m(source_hw, hint_hw)
    return (sh * m + 7) // 8, (sw * m + 7) // 8
