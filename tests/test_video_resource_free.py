"""Resource lifecycle / leak checks (model: reference
``test_stream_resource_free.py`` — decode loops keep memory stable,
release is effective, decode continues after release).

GPU-memory monitors become host-RSS monitors on TPU hosts: the engine's
allocations (codec contexts, frames, staging) are all host-side.
"""

import os

import numpy as np
import pytest

from accvlab_tpu.video import CreateGopDecoder, GopDecoder, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames
from accvlab_tpu.video.readers import FixedSizeReaderMap, SampleReader


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("resfree")
    frames = make_moving_shape_frames(45, hw=(96, 128), seed=11)
    path = str(base / "clip.mp4")
    write_video(path, frames, fps=12, gop_size=15)
    return path, frames


def test_bundle_decode_loop_memory_stable(clip):
    """200 bundle decodes (decoder-cache hot path) must not grow RSS."""
    path, _ = clip
    dec = GopDecoder(num_workers=1)
    packets, _, _ = dec.GetGOP([path], [7])
    for _ in range(10):  # warm: caches, pools, allocator high-water
        dec.DecodeFromGOPRGB(packets, [path], [7])
    base = rss_mb()
    for _ in range(200):
        dec.DecodeFromGOPRGB(packets, [path], [7])
    growth = rss_mb() - base
    assert growth < 20.0, f"RSS grew {growth:.1f} MB over 200 decodes"


def test_stream_read_loop_memory_stable(clip):
    path, _ = clip
    readers = FixedSizeReaderMap(1)
    r = readers.get(path)
    for fid in range(20):
        r.read(fid % 45)
    base = rss_mb()
    for fid in range(300):
        r.read(fid % 45)
    growth = rss_mb() - base
    readers.release()
    assert growth < 20.0, f"RSS grew {growth:.1f} MB over 300 stream reads"


def test_reader_open_close_cycles_memory_stable(clip):
    """Open/close cycles (each opens demuxer + decoder) release fully."""
    path, _ = clip
    for _ in range(3):
        m = FixedSizeReaderMap(1)
        m.get(path).read(0)
        m.release()
    base = rss_mb()
    for _ in range(40):
        m = FixedSizeReaderMap(1)
        m.get(path).read(0)
        m.release()
    growth = rss_mb() - base
    assert growth < 15.0, f"RSS grew {growth:.1f} MB over 40 open/close cycles"


def test_async_loop_without_getbuffer_no_leak(clip):
    """Dropping readers with pending results must not accumulate (reference
    test_10_multiple_async_without_getbuffer_no_leak)."""
    path, _ = clip
    for _ in range(3):
        r = SampleReader(max_readers=1, num_workers=1)
        r.DecodeAsync([path], [3])
        r.ReleaseResources()
        del r
    base = rss_mb()
    for _ in range(25):
        r = SampleReader(max_readers=1, num_workers=1)
        r.DecodeAsync([path], [3])
        r.ReleaseResources()
        del r
    growth = rss_mb() - base
    assert growth < 15.0, f"RSS grew {growth:.1f} MB over dropped async readers"


def test_release_decoder_then_continue(clip):
    """Release mid-life, keep decoding (reference test_06/test_09)."""
    path, frames = clip
    dec = CreateGopDecoder()
    packets, _, _ = dec.GetGOP([path], [20])
    (before,) = dec.DecodeFromGOPRGB(packets, [path], [20])
    dec.ReleaseResources()
    dec.clear_cache()
    packets, _, _ = dec.GetGOP([path], [20])
    (after,) = dec.DecodeFromGOPRGB(packets, [path], [20])
    np.testing.assert_array_equal(before, after)


def test_async_single_worker_no_deadlock(clip):
    """num_workers=1 must still complete DecodeAsync -> GetBuffer: the
    in-flight batch runs on a dedicated dispatch thread, not on the read
    pool it fans out to (same-pool nested submit deadlocked forever)."""
    from accvlab_tpu.video.readers import BatchAsyncStreamReader

    path, frames = clip
    r = SampleReader(max_readers=1, num_workers=1)
    r.DecodeAsync([path], [5])
    (img,) = r.GetBuffer([path], [5])
    assert np.abs(img.astype(np.int32) - frames[5].astype(np.int32)).mean() < 24
    b = BatchAsyncStreamReader(max_readers=1, num_workers=1)
    b.Decode([path], [[2, 9]])
    out = b.GetBuffer([path], [[2, 9]])
    assert len(out[0]) == 2


def test_del_with_pending_async_no_deadlock(clip):
    """Destruction with an in-flight task must not deadlock (reference
    test_09_del_with_pending_async_task_no_deadlock)."""
    path, _ = clip
    r = SampleReader(max_readers=1, num_workers=1)
    r.DecodeAsync([path], [40])
    del r  # worker may still be decoding; must not hang interpreter
