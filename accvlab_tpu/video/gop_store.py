"""Cross-process GOP cache in POSIX shared memory.

TPU-native re-design of the reference's ``SharedGopStore``
(``on_demand_video_decoder/accvlab/.../_internal/shared_gop_store.py:98-547``):
a fixed-capacity metadata table in one SharedMemory segment plus one
SharedMemory block per cached GOP bundle. Worker processes ``put`` bundles and
pass tiny picklable :class:`GopRef` tuples through loader IPC; the consumer
``read``s/``get_batch``es the payloads zero-copy. ``flock`` on a lock file
provides cross-process mutual exclusion (works across spawn workers); LRU
eviction uses a monotonic access tick stored in the table.
"""

from __future__ import annotations

import fcntl
import glob
import hashlib
import os
import tempfile
from multiprocessing import shared_memory
from typing import List, Optional

import numpy as np

from .types import GopRef

ENTRY_DTYPE = np.dtype(
    [
        ("path_hash", np.uint64),
        ("first_frame_id", np.int32),
        ("gop_len", np.int32),
        ("data_size", np.int64),
        ("state", np.uint8),
        ("_pad", np.uint8, (7,)),
        ("access_tick", np.int64),
        ("shm_name", "S48"),
    ]
)

_FREE = 0
_USED = 1
_SHM_PREFIX = "accvgs"


def _hash_path(video_path: str) -> np.uint64:
    digest = hashlib.md5(video_path.encode()).digest()
    return np.frombuffer(digest[:8], np.uint64)[0]


class SharedGopStore:
    """Fixed-capacity cross-process GOP bundle cache. Use :meth:`create` in
    the owner process and :meth:`attach` in workers."""

    def __init__(self, capacity: int, store_id: int, _create: bool, *, _key=None):
        assert _key is _FACTORY_KEY, "Use SharedGopStore.create() / .attach()"
        self._capacity = capacity
        self._store_id = store_id
        self._meta_name = f"{_SHM_PREFIX}_meta_{store_id}"
        meta_size = capacity * ENTRY_DTYPE.itemsize + 16  # + tick counter + stats
        if _create:
            try:
                old = shared_memory.SharedMemory(name=self._meta_name)
                old.close()
                old.unlink()
            except FileNotFoundError:
                pass
            self._meta_shm = shared_memory.SharedMemory(
                name=self._meta_name, create=True, size=meta_size
            )
            self._meta_shm.buf[:meta_size] = b"\x00" * meta_size
        else:
            self._meta_shm = shared_memory.SharedMemory(name=self._meta_name)
        self._entries = np.ndarray(
            capacity, dtype=ENTRY_DTYPE, buffer=self._meta_shm.buf[: capacity * ENTRY_DTYPE.itemsize]
        )
        self._counters = np.ndarray(
            2, dtype=np.int64, buffer=self._meta_shm.buf[capacity * ENTRY_DTYPE.itemsize :]
        )  # [tick, hit_count]
        self._lock_path = os.path.join(
            tempfile.gettempdir(), f"{_SHM_PREFIX}_lock_{store_id}"
        )
        self._lock_fd = os.open(self._lock_path, os.O_CREAT | os.O_RDWR, 0o600)
        self._is_owner = _create
        self._seq = 0

    # -- factories ------------------------------------------------------- #

    @classmethod
    def create(cls, capacity: int, store_id: int = 0) -> "SharedGopStore":
        """Create a fresh store (owner process)."""
        return cls(capacity, store_id, True, _key=_FACTORY_KEY)

    @classmethod
    def attach(cls, capacity: int, store_id: int = 0) -> "SharedGopStore":
        """Attach to an existing store (worker processes)."""
        return cls(capacity, store_id, False, _key=_FACTORY_KEY)

    # -- locking --------------------------------------------------------- #

    def _lock(self):
        fcntl.flock(self._lock_fd, fcntl.LOCK_EX)

    def _unlock(self):
        fcntl.flock(self._lock_fd, fcntl.LOCK_UN)

    def _next_tick(self) -> int:
        self._counters[0] += 1
        return int(self._counters[0])

    # -- operations ------------------------------------------------------ #

    def lookup(self, video_path: str, frame_id: int) -> Optional[GopRef]:
        """Find a cached GOP covering ``frame_id``; bumps LRU on hit."""
        h = _hash_path(video_path)
        self._lock()
        try:
            for i in range(self._capacity):
                e = self._entries[i]
                if (
                    e["state"] == _USED
                    and e["path_hash"] == h
                    and e["first_frame_id"] <= frame_id < e["first_frame_id"] + e["gop_len"]
                ):
                    self._entries[i]["access_tick"] = self._next_tick()
                    self._counters[1] += 1
                    return GopRef(
                        shm_name=e["shm_name"].decode(),
                        filepath=video_path,
                        first_frame_id=int(e["first_frame_id"]),
                        gop_len=int(e["gop_len"]),
                        size=int(e["data_size"]),
                    )
            return None
        finally:
            self._unlock()

    def _find_free_or_evict_locked(self) -> int:
        for i in range(self._capacity):
            if self._entries[i]["state"] == _FREE:
                return i
        used_ticks = self._entries["access_tick"]
        victim = int(np.argmin(used_ticks))
        name = self._entries[victim]["shm_name"].decode()
        try:
            shm = shared_memory.SharedMemory(name=name)
            shm.close()
            shm.unlink()
        except FileNotFoundError:
            pass
        self._entries[victim]["state"] = _FREE
        return victim

    def put(
        self, video_path: str, first_frame_id: int, gop_len: int, data: np.ndarray
    ) -> GopRef:
        """Insert a GOP bundle; evicts the LRU entry when full. If another
        process already cached an overlapping GOP, that entry is returned."""
        data = np.ascontiguousarray(np.asarray(data, np.uint8))
        h = _hash_path(video_path)
        self._lock()
        try:
            for i in range(self._capacity):
                e = self._entries[i]
                if (
                    e["state"] == _USED
                    and e["path_hash"] == h
                    and e["first_frame_id"] == first_frame_id
                ):
                    self._entries[i]["access_tick"] = self._next_tick()
                    return GopRef(
                        e["shm_name"].decode(), video_path,
                        int(e["first_frame_id"]), int(e["gop_len"]), int(e["data_size"]),
                    )
            slot = self._find_free_or_evict_locked()
            self._seq += 1
            name = f"{_SHM_PREFIX}_{self._store_id}_{os.getpid()}_{self._seq}"
            shm = shared_memory.SharedMemory(name=name, create=True, size=max(1, data.nbytes))
            shm.buf[: data.nbytes] = data.tobytes()
            shm.close()
            e = self._entries[slot]
            e["path_hash"] = h
            e["first_frame_id"] = first_frame_id
            e["gop_len"] = gop_len
            e["data_size"] = data.nbytes
            e["state"] = _USED
            e["access_tick"] = self._next_tick()
            e["shm_name"] = name.encode()
            return GopRef(name, video_path, first_frame_id, gop_len, data.nbytes)
        finally:
            self._unlock()

    def read(self, ref: GopRef) -> np.ndarray:
        """Copy a cached bundle out of shared memory."""
        shm = shared_memory.SharedMemory(name=ref.shm_name)
        try:
            return np.frombuffer(shm.buf[: ref.size], np.uint8).copy()
        finally:
            shm.close()

    def get_batch(self, refs: List[GopRef]) -> List[np.ndarray]:
        return [self.read(r) for r in refs]

    # -- observability / lifecycle --------------------------------------- #

    def get_stats(self) -> dict:
        used = int(np.count_nonzero(self._entries["state"] == _USED))
        return {
            "capacity": self._capacity,
            "used_slots": used,
            "hit_count": int(self._counters[1]),
        }

    def reset_stats(self):
        self._counters[1] = 0

    def cleanup(self):
        """Owner: unlink all data blocks + the metadata segment (also scans
        for orphaned segments of this store id, parity: ``cleanup:457``)."""
        self._lock()
        try:
            for i in range(self._capacity):
                if self._entries[i]["state"] == _USED:
                    name = self._entries[i]["shm_name"].decode()
                    try:
                        shm = shared_memory.SharedMemory(name=name)
                        shm.close()
                        shm.unlink()
                    except FileNotFoundError:
                        pass
                    self._entries[i]["state"] = _FREE
        finally:
            self._unlock()
        # orphan scan: segments created by crashed workers
        for path in glob.glob(f"/dev/shm/{_SHM_PREFIX}_{self._store_id}_*"):
            try:
                os.unlink(path)
            except OSError:
                pass
        self._entries = None
        self._counters = None
        self._meta_shm.close()
        if self._is_owner:
            try:
                self._meta_shm.unlink()
            except FileNotFoundError:
                pass
        os.close(self._lock_fd)

    def close(self):
        """Close shared-memory handles WITHOUT unlinking — call from worker
        processes before exit (parity: reference ``shared_gop_store.py:496``)."""
        self.detach()

    def detach(self):
        """Worker: release the mapping without destroying the store."""
        self._entries = None
        self._counters = None
        self._meta_shm.close()
        os.close(self._lock_fd)


_FACTORY_KEY = object()
