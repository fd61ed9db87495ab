"""ctypes binding + lazy build of the native wire-compression encoder.

Same pattern as ``hostcopy.native``: built with g++ on first use, cached by
content hash (``accvlab_tpu._native_build``); ``get_lib()`` returns ``None``
when the toolchain is unavailable and callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import threading
import warnings
from typing import Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    from accvlab_tpu._native_build import build_shared_lib

    src = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "csrc", "wirepack.cpp"
    )
    lib = ctypes.CDLL(build_shared_lib(src, "libaccvlab_wirepack", []))
    lib.accvlab_wire_analyze.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.accvlab_wire_pack.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.accvlab_wire_pack.restype = ctypes.c_int64
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
                    f"native wire encoder unavailable ({e}); using the "
                    "numpy fallback"
                )
                _LIB_FAILED = True
    return _LIB


def _check_plane2d(plane2d: np.ndarray, group: int) -> None:
    """The C engine trusts its pointer: enforce the layout contract here
    (a non-contiguous view or a non-multiple-of-8 row would silently
    corrupt the wire instead of erroring like the numpy path does)."""
    if plane2d.dtype != np.uint8 or plane2d.ndim != 2:
        raise TypeError(
            f"native wire encoder needs a 2-D uint8 plane, got "
            f"{plane2d.dtype} {plane2d.shape}"
        )
    if not plane2d.flags["C_CONTIGUOUS"]:
        raise ValueError("native wire encoder needs a C-contiguous plane")
    if plane2d.shape[1] % 8 != 0:
        raise ValueError(
            f"native wire encoder: row width {plane2d.shape[1]} must be "
            "divisible by 8"
        )
    if group < 1 or plane2d.shape[1] % group != 0:
        raise ValueError(
            f"native wire encoder: group {group} must divide the row "
            f"width {plane2d.shape[1]}"
        )


def analyze(plane2d: np.ndarray, group: int):
    """Histograms (counts, len 1024) of both predictors' zigzag residuals.

    ``plane2d``: C-contiguous uint8 ``(H, Wr)``; ``group`` = trailing
    elements per horizontal step. Returns ``(hist_vertical, hist_plane)``
    or ``None`` when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    _check_plane2d(plane2d, group)
    h1 = np.zeros((1024,), np.uint32)
    h2 = np.zeros((1024,), np.uint32)
    lib.accvlab_wire_analyze(
        plane2d.ctypes.data,
        plane2d.shape[0],
        plane2d.shape[1],
        group,
        h1.ctypes.data,
        h2.ctypes.data,
    )
    return h1, h2


def pack(plane2d: np.ndarray, group: int, mode: int, b: int, cap: int):
    """Bitplanes + exception list for the chosen ``(mode, b)``.

    Returns ``(bp, excp, excv)`` or ``None`` when unavailable. Raises if
    the true exception count exceeds ``cap`` (caller sized it from the
    analyze histograms, so this indicates a bug, not bad data).
    """
    lib = get_lib()
    if lib is None:
        return None
    _check_plane2d(plane2d, group)
    h, wr = plane2d.shape
    bp = np.empty((b, h, wr // 8), np.uint8)
    excp = np.full((cap,), h * wr, np.int32)
    excv = np.zeros((cap,), np.int16)
    ne = lib.accvlab_wire_pack(
        plane2d.ctypes.data,
        h,
        wr,
        group,
        mode,
        b,
        bp.ctypes.data,
        excp.ctypes.data,
        excv.ctypes.data,
        cap,
    )
    if ne > cap:
        raise RuntimeError(
            f"wire pack: {ne} exceptions exceed the sized capacity {cap}"
        )
    return bp, excp, excv
