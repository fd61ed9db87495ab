"""Stream readers: multi-slot sequential decode with async double buffering.

TPU-native re-design of the reference's ``PyNvSampleReader`` /
``CreateSampleReader`` and ``PyNvBatchAsyncStreamReader``
(``inc/PyNvSampleReader.hpp:42``, ``inc/PyNvBatchAsyncStreamReader.hpp:37``):

* a fixed-size reader map with round-robin eviction
  (``FixedSizeVideoReaderMap.hpp:27``) holds one decoder-state-continuous
  stream reader per recently used file — sequential samplers decode forward
  without re-seeking;
* async variants keep at most ONE decode task in flight with a capacity-1
  result slot, and ``GetBuffer`` validates that the request matches the
  in-flight one (the reference's request-key contract,
  ``PyNvSampleReader.hpp:159-165``).
"""

from __future__ import annotations

import ctypes
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .native import get_lib, last_error


class _StreamReader:
    """One file's sequential reader (wraps the C engine's StreamReader)."""

    def __init__(self, path: str):
        lib = get_lib()
        self._lib = lib
        self._h = lib.avx_reader_open(path.encode())
        if not self._h:
            raise RuntimeError(f"Cannot open video '{path}': {last_error()}")
        self.path = path
        self.height = lib.avx_reader_height(self._h)
        self.width = lib.avx_reader_width(self._h)
        self.num_frames = lib.avx_reader_num_frames(self._h)
        # the native reader mutates decoder state per call; serialize access
        # (readers for DIFFERENT files still decode in parallel)
        self._read_lock = threading.Lock()

    def read(self, frame_id: int, as_bgr: bool = False, out_hw=None) -> np.ndarray:
        """Read one RGB (or BGR) frame. ``out_hw``: optional ``(height,
        width)`` fused decode+resize target — the frame is swscale-resized
        inside the decode pass (see :meth:`read_yuv`)."""
        from .decoder import _WIRE_BGR, _WIRE_RGB, _check_out_hw

        if out_hw is None:
            h, w = self.height, self.width
        else:
            h, w = _check_out_hw(out_hw, require_even=False)
        out = np.empty((h, w, 3), np.uint8)
        with self._read_lock:
            if not self._h:
                raise RuntimeError(f"reader for '{self.path}' is closed")
            rc = self._lib.avx_reader_read_sized(
                self._h,
                int(frame_id),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                _WIRE_BGR if as_bgr else _WIRE_RGB,
                None,
                0 if out_hw is None else w,
                0 if out_hw is None else h,
            )
        if rc != 0:
            raise RuntimeError(
                f"read frame {frame_id} of '{self.path}' failed: {last_error()}"
            )
        return out

    def read_yuv(self, frame_id: int, out_hw=None):
        """Read one frame in the YUV 4:2:0 wire layout (see
        :class:`accvlab_tpu.video.YuvFrame`): no host colorspace math, half
        the bytes of :meth:`read` on the way to the device. ``out_hw``:
        optional even ``(height, width)`` fused decode+resize target (the
        video analog of ``ImageDecoder(decode_resize_hw=...)``) — wire bytes
        drop by the area ratio before transfer."""
        from .decoder import YuvFrame, _WIRE_YUV420, _check_out_hw, _color_names

        if out_hw is None:
            h, w = self.height, self.width
        else:
            h, w = _check_out_hw(out_hw)
        if (h | w) & 1:
            raise RuntimeError(
                f"yuv420 wire output needs even frame dimensions, got {w}x{h}"
            )
        out = np.empty(h * w * 3 // 2, np.uint8)
        color = np.zeros(2, np.int32)
        with self._read_lock:
            if not self._h:
                raise RuntimeError(f"reader for '{self.path}' is closed")
            rc = self._lib.avx_reader_read_sized(
                self._h,
                int(frame_id),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                _WIRE_YUV420,
                color.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                0 if out_hw is None else w,
                0 if out_hw is None else h,
            )
        if rc != 0:
            raise RuntimeError(
                f"read frame {frame_id} of '{self.path}' failed: {last_error()}"
            )
        matrix, color_range = _color_names(int(color[0]), int(color[1]))
        return YuvFrame(
            out[: h * w].reshape(h, w),
            out[h * w :].reshape(h // 2, w // 2, 2),
            matrix,
            color_range,
        )

    def close(self):
        # take the read lock: freeing the native handle while another thread
        # is inside avx_reader_read would hand libav freed state (release/
        # eviction can race an in-flight async decode)
        with self._read_lock:
            if self._h:
                self._lib.avx_reader_close(self._h)
                self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class FixedSizeReaderMap:
    """Fixed-slot reader cache with round-robin eviction (parity:
    ``FixedSizeVideoReaderMap.hpp:27``)."""

    def __init__(self, capacity: int):
        self._capacity = capacity
        self._readers = {}
        self._order: List[str] = []
        self._lock = threading.Lock()

    def get(self, path: str) -> _StreamReader:
        with self._lock:
            if path in self._readers:
                return self._readers[path]
        reader = _StreamReader(path)
        with self._lock:
            if path in self._readers:  # raced
                reader.close()
                return self._readers[path]
            self._readers[path] = reader
            self._order.append(path)
            while len(self._order) > self._capacity:
                evict = self._order.pop(0)
                self._readers.pop(evict).close()
        return reader

    def release(self):
        with self._lock:
            for r in self._readers.values():
                r.close()
            self._readers.clear()
            self._order.clear()


def _reject_yuv_bgr(yuv, as_bgr):
    """``as_bgr`` orders host-produced RGB bytes; the YUV wire produces no
    RGB on the host at all — the combination is a silent channel-order bug
    waiting to happen (parity: ``ImageDecoder`` rejects ``as_bgr`` with
    ``wire_format='yuv420'`` for the same reason)."""
    if yuv and as_bgr:
        raise ValueError(
            "as_bgr with yuv=True: the YUV wire ships YCbCr planes; pass "
            "as_bgr to the device-side conversion "
            "(YCbCrToRGBConverter / YuvFrame.to_rgb) instead"
        )


def _validate_sizing(**kwargs):
    """Non-positive sizing arguments are rejected at construction (parity:
    the reference factories reject num_of_set/num_of_file/
    max_frames_per_decode_call <= 0)."""
    for name, value in kwargs.items():
        if int(value) <= 0:
            raise ValueError(f"{name} must be positive, got {value}")


class SampleReader:
    """Multi-slot stream reader: sync + async single-frame-per-file decode.

    Parity: ``PyNvSampleReader`` (sync ``run_rgb_out``, async
    ``DecodeN12ToRGBAsync`` / ``...GetBuffer`` with the single-in-flight
    capacity-1 contract).
    """

    def __init__(self, max_readers: int = 8, num_workers: int = 4):
        _validate_sizing(max_readers=max_readers, num_workers=num_workers)
        self._max_readers = max_readers
        self._map = FixedSizeReaderMap(max_readers)
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="accvlab-sreader"
        )
        # the in-flight batch runs on a DEDICATED orchestration thread (the
        # reference's ThreadRunner): _read_batch fans out to self._pool and
        # WAITS — running it on the same pool deadlocks once every worker
        # holds a waiting batch (num_workers=1 hangs GetBuffer forever)
        self._dispatch = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="accvlab-sreader-dispatch"
        )
        self._inflight: Optional[Tuple[tuple, Future]] = None
        self._lock = threading.Lock()

    def _validate_request(self, paths, frame_ids):
        """Entry validation (parity: PyNvSampleReader's size checks)."""
        if len(paths) == 0:
            raise RuntimeError("filepaths must not be empty")
        if len(paths) != len(frame_ids):
            raise RuntimeError(
                f"filepaths.size() ({len(paths)}) != frame_ids.size() "
                f"({len(frame_ids)})"
            )
        if len(paths) > self._max_readers:
            raise RuntimeError(
                f"number of files ({len(paths)}) exceeds num_of_file "
                f"({self._max_readers})"
            )

    def _read_batch(self, paths, frame_ids, as_bgr, yuv=False, out_hw=None):
        def read_one(p, f):
            r = self._map.get(p)
            return r.read_yuv(f, out_hw) if yuv else r.read(f, as_bgr, out_hw)

        futures = [
            self._pool.submit(read_one, p, f) for p, f in zip(paths, frame_ids)
        ]
        return [f.result() for f in futures]

    def run_rgb_out(
        self, paths: Sequence[str], frame_ids: Sequence[int],
        as_bgr: bool = False, out_hw=None,
    ) -> List[np.ndarray]:
        """Synchronous batch read (parity: ``run_rgb_out``). ``out_hw``:
        optional ``(height, width)`` fused decode+resize target."""
        paths, frame_ids = list(paths), list(frame_ids)
        self._validate_request(paths, frame_ids)
        return self._read_batch(paths, frame_ids, as_bgr, out_hw=out_hw)

    def run_yuv_out(self, paths: Sequence[str], frame_ids: Sequence[int],
                    out_hw=None):
        """Synchronous batch read in the YUV 4:2:0 wire layout — half the
        host->device bytes of :meth:`run_rgb_out`, converted on device (see
        :class:`accvlab_tpu.video.YuvFrame`). ``out_hw``: optional even
        ``(height, width)`` fused decode+resize target (wire bytes drop by
        the area ratio)."""
        paths, frame_ids = list(paths), list(frame_ids)
        self._validate_request(paths, frame_ids)
        return self._read_batch(paths, frame_ids, False, yuv=True, out_hw=out_hw)

    @staticmethod
    def _request_key(paths, frame_ids, as_bgr, yuv=False, out_hw=None):
        return (tuple(paths), tuple(int(f) for f in frame_ids), bool(as_bgr),
                bool(yuv), None if out_hw is None else tuple(out_hw))

    def DecodeAsync(
        self, paths: Sequence[str], frame_ids: Sequence[int],
        as_bgr: bool = False, yuv: bool = False, out_hw=None,
    ):
        """Start an async batch read; at most one request may be in flight
        (parity: ``DecodeN12ToRGBAsync``). ``yuv=True`` returns
        :class:`YuvFrame` wire-layout frames instead of RGB; ``out_hw``
        fuses a resize into the decode (both formats; the YUV wire needs
        even dims)."""
        _reject_yuv_bgr(yuv, as_bgr)
        if out_hw is not None:  # eager: a bad target must point at THIS call
            from .decoder import _check_out_hw

            _check_out_hw(out_hw, require_even=yuv)
        self._validate_request(list(paths), list(frame_ids))
        key = self._request_key(paths, frame_ids, as_bgr, yuv, out_hw)
        with self._lock:
            if self._inflight is not None:
                raise RuntimeError(
                    "A decode request is already in flight; call GetBuffer first."
                )
            future = self._dispatch.submit(
                self._read_batch, list(paths), list(frame_ids), as_bgr, yuv,
                out_hw,
            )
            self._inflight = (key, future)

    def GetBuffer(
        self, paths: Sequence[str], frame_ids: Sequence[int],
        as_bgr: bool = False, yuv: bool = False, out_hw=None,
    ) -> List:
        """Block for the in-flight request; the arguments must match it —
        including the format AND ``out_hw``: a ``yuv=True`` request can only
        be collected with the same ``yuv``/``out_hw`` (parity:
        request-mismatch validation, ``PyNvSampleReader.hpp:159``). Returns
        ``List[np.ndarray]`` RGB frames, or ``List[YuvFrame]`` when the
        request was ``yuv=True``."""
        key = self._request_key(paths, frame_ids, as_bgr, yuv, out_hw)
        with self._lock:
            if self._inflight is None:
                raise RuntimeError("No decode request in flight; call DecodeAsync first.")
            inflight_key, future = self._inflight
        if inflight_key != key:
            raise RuntimeError(
                "GetBuffer request does not match the in-flight Decode request."
            )
        try:
            return future.result()
        finally:
            with self._lock:
                self._inflight = None

    def ReleaseResources(self):
        self._map.release()

    # maintenance parity (reference: clearAllReaders / release_device_memory /
    # release_decoder — idempotent, safe no-ops with no task pending). The
    # FFmpeg engine holds host-side demux+decode state only; all three relieve
    # the same resource here.
    def clearAllReaders(self):
        self._map.release()

    def release_device_memory(self):
        self._map.release()

    def release_decoder(self):
        self._map.release()


class BatchAsyncStreamReader:
    """Async V x F 2-D batch decode with the single-in-flight contract.

    Parity: ``PyNvBatchAsyncStreamReader`` — ``Decode(paths[V],
    frame_ids[V][F])`` enqueues; ``GetBuffer`` blocks, validates the request,
    and returns ``List[List[frame]]`` (per video, per frame).
    """

    def __init__(
        self,
        max_readers: int = 8,
        num_workers: int = 4,
        max_frames_per_decode_call: int = 64,
    ):
        _validate_sizing(
            max_readers=max_readers,
            num_workers=num_workers,
            max_frames_per_decode_call=max_frames_per_decode_call,
        )
        self._max_readers = max_readers
        self._max_frames = max_frames_per_decode_call
        self._map = FixedSizeReaderMap(max_readers)
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="accvlab-breader"
        )
        # dedicated orchestration thread — see SampleReader.__init__
        self._dispatch = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="accvlab-breader-dispatch"
        )
        self._inflight: Optional[Tuple[tuple, Future]] = None
        self._lock = threading.Lock()

    def _validate_request(self, paths, frame_ids):
        """Entry validation of the V x F request (parity:
        ``test_batch_async_stream_decoder.py`` Section B contract)."""
        if len(paths) == 0:
            raise RuntimeError("filepaths must not be empty")
        if len(paths) != len(frame_ids):
            raise RuntimeError(
                f"filepaths.size() ({len(paths)}) != frame_ids_2d.size() "
                f"({len(frame_ids)})"
            )
        if len(paths) > self._max_readers:
            raise RuntimeError(
                f"number of files ({len(paths)}) exceeds num_of_file "
                f"({self._max_readers})"
            )
        if len(frame_ids[0]) == 0:
            raise RuntimeError("frame_ids_2d[0] must not be empty")
        inner = len(frame_ids[0])
        for v, row in enumerate(frame_ids):
            if len(row) != inner:
                raise RuntimeError(
                    "jagged inner lengths are not supported: "
                    f"frame_ids_2d[{v}] has {len(row)} entries, expected {inner}"
                )
        if inner > self._max_frames:
            raise RuntimeError(
                f"frames per call ({inner}) exceeds max_frames_per_decode_call "
                f"({self._max_frames})"
            )

    @staticmethod
    def _request_key(paths, frame_ids, as_bgr, yuv=False, out_hw=None):
        return (
            tuple(paths),
            tuple(tuple(int(f) for f in row) for row in frame_ids),
            bool(as_bgr),
            bool(yuv),
            None if out_hw is None else tuple(out_hw),
        )

    def _decode_all(self, paths, frame_ids, as_bgr, yuv=False, out_hw=None):
        # one task per video: frames of one video decode sequentially
        # (decoder-state continuity), videos decode in parallel
        def per_video(path, ids):
            reader = self._map.get(path)
            if yuv:
                return [reader.read_yuv(f, out_hw) for f in ids]
            return [reader.read(f, as_bgr, out_hw) for f in ids]

        futures = [
            self._pool.submit(per_video, p, ids) for p, ids in zip(paths, frame_ids)
        ]
        return [f.result() for f in futures]

    def Decode(
        self,
        paths: Sequence[str],
        frame_ids: Sequence[Sequence[int]],
        as_bgr: bool = False,
        yuv: bool = False,
        out_hw=None,
    ):
        """Enqueue an async V x F decode (parity: ``Decode``; at most one in
        flight). ``yuv=True`` returns :class:`YuvFrame` wire-layout frames;
        ``out_hw`` fuses a resize into the decode (both formats; the YUV
        wire needs even dims)."""
        _reject_yuv_bgr(yuv, as_bgr)
        if out_hw is not None:  # eager: a bad target must point at THIS call
            from .decoder import _check_out_hw

            _check_out_hw(out_hw, require_even=yuv)
        self._validate_request(list(paths), [list(r) for r in frame_ids])
        key = self._request_key(paths, frame_ids, as_bgr, yuv, out_hw)
        with self._lock:
            if self._inflight is not None:
                raise RuntimeError(
                    "A decode request is already in flight; call GetBuffer first."
                )
            future = self._dispatch.submit(
                self._decode_all, list(paths), [list(r) for r in frame_ids],
                as_bgr, yuv, out_hw
            )
            self._inflight = (key, future)

    def GetBuffer(
        self,
        paths: Sequence[str],
        frame_ids: Sequence[Sequence[int]],
        as_bgr: bool = False,
        yuv: bool = False,
        out_hw=None,
    ) -> List[List]:
        """Block + validate (format and ``out_hw`` included in the key).
        Returns ``List[List[np.ndarray]]`` RGB frames per video, or
        ``List[List[YuvFrame]]`` when the request was ``yuv=True``."""
        key = self._request_key(paths, frame_ids, as_bgr, yuv, out_hw)
        with self._lock:
            if self._inflight is None:
                raise RuntimeError("No decode request in flight; call Decode first.")
            inflight_key, future = self._inflight
        if inflight_key != key:
            raise RuntimeError(
                "GetBuffer request does not match the in-flight Decode request."
            )
        try:
            return future.result()
        finally:
            with self._lock:
                self._inflight = None

    def ReleaseResources(self):
        self._map.release()

    # maintenance parity — see SampleReader
    def clearAllReaders(self):
        self._map.release()

    def release_device_memory(self):
        self._map.release()

    def release_decoder(self):
        self._map.release()


def CreateSampleReader(max_readers: int = 8, num_workers: int = 4, **_parity_kwargs):
    """Factory (parity: reference ``CreateSampleReader``)."""
    return SampleReader(max_readers=max_readers, num_workers=num_workers)


def CreateBatchAsyncStreamReader(max_readers: int = 8, num_workers: int = 4, **_parity_kwargs):
    """Factory (parity: reference ``PyNvBatchAsyncStreamReader`` creation)."""
    return BatchAsyncStreamReader(max_readers=max_readers, num_workers=num_workers)
