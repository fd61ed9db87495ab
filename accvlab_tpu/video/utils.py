"""OS-level utilities (parity: reference ``_internal/utils.py:27-60``)."""

from __future__ import annotations

import os
from enum import Enum
from typing import List, Sequence, Tuple


class DropCacheStatus(Enum):
    SUCCESS = 0
    FILE_NOT_FOUND = 1
    ERROR = 2


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
                os.fsync(fd) if False else None
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
            results.append((path, DropCacheStatus.SUCCESS))
        except OSError:
            results.append((path, DropCacheStatus.ERROR))
    return results
