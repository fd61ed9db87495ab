"""ctypes binding + lazy build of the native DCT-wire band encoder.

Same pattern as :mod:`wire_native` (the pixel-wire encoder): built with g++
on first use, cached by content hash (``accvlab_tpu._native_build``);
``get_lib()`` returns ``None`` when the toolchain is unavailable and
:class:`DCTWirePacker` falls back to the numpy path (byte-identical wire,
tested)."""

from __future__ import annotations

import ctypes
import os
import threading
import warnings
from typing import Optional

import numpy as np

_BINS = 1 << 14

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    from accvlab_tpu._native_build import build_shared_lib

    src = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "csrc", "dctpack.cpp"
    )
    lib = ctypes.CDLL(build_shared_lib(src, "libaccvlab_dctpack", []))
    lib.accvlab_dct_analyze.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.accvlab_dct_dc_analyze.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.accvlab_dct_pack_group.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.accvlab_dct_pack_group.restype = ctypes.c_int64
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is None and not _LIB_FAILED:
            try:
                _LIB = _build_and_load()
            except Exception as e:  # pragma: no cover - toolchain-dependent
                warnings.warn(
                    f"native DCT band encoder unavailable ({e}); using the "
                    "numpy fallback"
                )
                _LIB_FAILED = True
    return _LIB


def _check_bands(bands: np.ndarray) -> None:
    if bands.dtype != np.int16 or bands.ndim != 3:
        raise TypeError(
            f"native DCT encoder needs 3-D int16 bands, got "
            f"{bands.dtype} {bands.shape}"
        )
    if not bands.flags["C_CONTIGUOUS"]:
        raise ValueError("native DCT encoder needs C-contiguous bands")
    if bands.shape[2] % 8 != 0:
        raise ValueError(
            f"native DCT encoder: row width {bands.shape[2]} must be "
            "divisible by 8"
        )


def analyze(bands: np.ndarray, bounds) -> Optional[tuple]:
    """Per-group width summaries ("fits" tables) in one sweep.

    ``bands``: C-contiguous int16 ``(nb, bh, bwp)``; ``bounds``: the
    ``ngroups+1`` band partition (group 0 must be the DC band alone).
    Returns ``(fits, dc3)`` — uint32 ``(ngroups, 15)`` with row 0 zero
    and uint32 ``(3, 15)`` for the DC predictor variants, where
    ``fits[g][b] = count(zigzag < 2**b)`` — or ``None`` when the native
    library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    _check_bands(bands)
    bounds = np.ascontiguousarray(bounds, np.int64)
    ngroups = bounds.size - 1
    if bounds[0] != 0 or bounds[1] != 1 or bounds[-1] != bands.shape[0]:
        raise ValueError(
            "native DCT encoder: bounds must start (0, 1, ...) — group 0 "
            "is the DC band alone — and cover all bands"
        )
    fits = np.zeros((ngroups, 15), np.uint32)
    dc3 = np.zeros((3, 15), np.uint32)
    lib.accvlab_dct_analyze(
        bands.ctypes.data, bands.shape[1], bands.shape[2],
        bounds.ctypes.data, ngroups, fits.ctypes.data,
    )
    lib.accvlab_dct_dc_analyze(
        bands.ctypes.data, bands.shape[1], bands.shape[2], dc3.ctypes.data
    )
    return fits, dc3


def pack_group(
    bands: np.ndarray,
    start: int,
    end: int,
    dc_mode: int,
    b: int,
    bp: np.ndarray,
    excp: np.ndarray,
    excv: np.ndarray,
    ne: int,
) -> Optional[int]:
    """Pack bands ``[start:end)`` at width ``b`` into ``bp`` and append
    exceptions (positions globally offset) to the unified list at ``ne``.

    ``dc_mode``: the DC predictor if ``start == 0``, else ``-1``. Returns
    the new true exception count (caller errors if it exceeds the list
    capacity), or ``None`` when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    _check_bands(bands)
    nb = end - start
    bh, bwp = bands.shape[1], bands.shape[2]
    assert bp.shape == (b, nb * bh, bwp // 8) and bp.dtype == np.uint8
    assert excp.dtype == np.int32 and excv.dtype == np.int16
    new_ne = lib.accvlab_dct_pack_group(
        bands.ctypes.data + start * bh * bwp * 2, nb, bh, bwp,
        dc_mode if start == 0 else -1, b, bp.ctypes.data,
        excp.ctypes.data, excv.ctypes.data, excp.size,
        start * bh * bwp, ne,
    )
    return int(new_ne)
