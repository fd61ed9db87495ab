"""ctypes binding + lazy build of the C++ video engine."""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERROR: Optional[str] = None


def _build_and_load() -> ctypes.CDLL:
    from accvlab_tpu._native_build import build_shared_lib

    src_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
    src = os.path.join(src_dir, "video_engine.cpp")
    lib_path = build_shared_lib(
        src, "libaccvlab_video",
        ["-lavformat", "-lavcodec", "-lavutil", "-lswscale"],
    )
    lib = ctypes.CDLL(lib_path)

    lib.avx_last_error.restype = ctypes.c_char_p
    lib.avx_open.restype = ctypes.c_void_p
    lib.avx_open.argtypes = [ctypes.c_char_p]
    lib.avx_close.argtypes = [ctypes.c_void_p]
    for fn in ("avx_num_frames", "avx_width", "avx_height", "avx_codec_id"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
        getattr(lib, fn).restype = ctypes.c_int
    lib.avx_keyframe_of.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.avx_keyframe_of.restype = ctypes.c_int
    lib.avx_is_vfr.argtypes = [ctypes.c_void_p]
    lib.avx_is_vfr.restype = ctypes.c_int
    lib.avx_stream_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.avx_stream_info.restype = ctypes.c_int
    lib.avx_gop_bundle.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.avx_gop_bundle.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.avx_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.avx_bundle_info.restype = ctypes.c_int
    lib.avx_bundle_info.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.avx_decode_bundle.restype = ctypes.c_int
    lib.avx_decode_bundle.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.avx_decode_bundle_fmt.restype = ctypes.c_int
    lib.avx_decode_bundle_fmt.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.avx_decode_bundle_sized.restype = ctypes.c_int
    lib.avx_decode_bundle_sized.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.avx_reader_open.restype = ctypes.c_void_p
    lib.avx_reader_open.argtypes = [ctypes.c_char_p]
    lib.avx_reader_close.argtypes = [ctypes.c_void_p]
    for fn in ("avx_reader_width", "avx_reader_height", "avx_reader_num_frames"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
        getattr(lib, fn).restype = ctypes.c_int
    lib.avx_reader_read.restype = ctypes.c_int
    lib.avx_reader_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.avx_reader_read_fmt.restype = ctypes.c_int
    lib.avx_reader_read_fmt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.avx_reader_read_sized.restype = ctypes.c_int
    lib.avx_reader_read_sized.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.avx_encode_video.restype = ctypes.c_int
    lib.avx_encode_video.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.avx_encode_video2.restype = ctypes.c_int
    lib.avx_encode_video2.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
    ]
    return lib


def get_lib() -> ctypes.CDLL:
    """The video engine library, built on first use."""
    global _LIB, _LIB_ERROR
    if _LIB is not None:
        return _LIB
    if _LIB_ERROR is not None:
        raise RuntimeError(_LIB_ERROR)
    with _LIB_LOCK:
        if _LIB is None and _LIB_ERROR is None:
            try:
                _LIB = _build_and_load()
            except Exception as e:
                _LIB_ERROR = str(e)
                raise
    return _LIB


def last_error() -> str:
    return get_lib().avx_last_error().decode()
