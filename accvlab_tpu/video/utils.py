"""OS-level utilities (parity: reference ``_internal/utils.py:27-60``)."""

from __future__ import annotations

import os
from enum import Enum
from typing import List, Sequence, Tuple


class DropCacheStatus(Enum):
    SUCCESS = 0
    FILE_NOT_FOUND = 1
    ERROR = 2


def GetFastInitInfo(filepaths: Sequence[str]) -> List["FastStreamInfo"]:
    """Probe each video once and return reusable stream-init info.

    Parity: ``PyNvGopDecoder_constructors.cpp:37`` — the returned
    :class:`~accvlab_tpu.video.FastStreamInfo` objects can be passed to
    ``GetGOP``/readers so per-worker decoders skip the avformat probe.
    """
    import ctypes

    from .native import get_lib, last_error
    from .types import FastStreamInfo

    lib = get_lib()
    infos = []
    for path in filepaths:
        h = lib.avx_open(str(path).encode())
        if not h:
            raise RuntimeError(f"cannot probe {path}: {last_error()}")
        try:
            buf = (ctypes.c_int64 * 13)()
            lib.avx_stream_info(h, buf)
            infos.append(FastStreamInfo(*[int(v) for v in buf]))
        finally:
            lib.avx_close(h)
    return infos


def SavePacketsToFile(packets, filepath: str) -> None:
    """Write serialized GOP packet data (as returned by ``GetGOP``) to a file.

    Parity: ``PyNvGopDecoder_constructors.cpp:380`` — the saved bundle is
    self-describing and can be re-loaded and decoded without the source
    video.
    """
    import numpy as np

    data = np.ascontiguousarray(np.asarray(packets, np.uint8))
    with open(filepath, "wb") as f:
        f.write(data.tobytes())


def drop_videos_cache(filepaths: Sequence[str]) -> List[Tuple[str, DropCacheStatus]]:
    """Evict the given files from the Linux page cache
    (``posix_fadvise(POSIX_FADV_DONTNEED)``) — used to benchmark cold-cache
    decode paths. Returns per-file status."""
    results = []
    for path in filepaths:
        if not os.path.exists(path):
            results.append((path, DropCacheStatus.FILE_NOT_FOUND))
            continue
        try:
            fd = os.open(path, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
            results.append((path, DropCacheStatus.SUCCESS))
        except OSError:
            results.append((path, DropCacheStatus.ERROR))
    return results
