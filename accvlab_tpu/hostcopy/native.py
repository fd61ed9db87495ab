"""ctypes binding + lazy build of the C++ packing engine."""

from __future__ import annotations

import ctypes
import os
import threading
import warnings
from typing import List, Optional

import numpy as np

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    from accvlab_tpu._native_build import build_shared_lib

    src_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
    src = os.path.join(src_dir, "pack.cpp")
    lib_path = build_shared_lib(src, "libaccvlab_pack", ["-lpthread"])
    lib = ctypes.CDLL(lib_path)
    lib.accvlab_pack_init.argtypes = [ctypes.c_int]
    lib.accvlab_pack.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.accvlab_pack_init(int(os.environ.get("ACCVLAB_PACK_THREADS", "4")))
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The packing library, built on first use; None if the toolchain is
    unavailable (callers fall back to single-threaded numpy packing)."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is None and not _LIB_FAILED:
            try:
                _LIB = _build_and_load()
            except Exception as e:  # pragma: no cover
                warnings.warn(f"hostcopy native packer unavailable ({e}); using numpy fallback")
                _LIB_FAILED = True
    return _LIB


def parallel_pack(arrays: List[np.ndarray], offsets: List[int], total_bytes: int) -> np.ndarray:
    """Pack contiguous arrays into one buffer at byte offsets (parallel C++
    scatter-memcpy; numpy fallback)."""
    staging = np.empty((total_bytes,), np.uint8)
    lib = get_lib()
    if lib is None:
        for arr, off in zip(arrays, offsets):
            n = arr.nbytes
            staging[off : off + n] = np.frombuffer(arr.tobytes(), np.uint8)
        return staging
    n = len(arrays)
    srcs = (ctypes.c_void_p * n)(*[arr.ctypes.data for arr in arrays])
    sizes = (ctypes.c_uint64 * n)(*[arr.nbytes for arr in arrays])
    offs = (ctypes.c_uint64 * n)(*offsets)
    lib.accvlab_pack(
        ctypes.cast(srcs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(sizes, ctypes.POINTER(ctypes.c_uint64)),
        ctypes.cast(offs, ctypes.POINTER(ctypes.c_uint64)),
        n,
        staging.ctypes.data,
    )
    return staging
