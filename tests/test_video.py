"""Video engine tests (model: reference on_demand_video_decoder/tests —
committed synthetic clips + per-pixel tolerance oracle vs a reference decode,
GOP cache hits/misses/LRU, stream readers incl. request-mismatch errors,
shared GOP store multi-process semantics)."""

import os

import numpy as np
import pytest

pytest.importorskip("ctypes")

from accvlab_tpu.video import (
    BatchAsyncStreamReader,
    CreateGopDecoder,
    CreateSampleReader,
    GopDecoder,
    SharedGopStore,
    drop_videos_cache,
    write_video,
)
from accvlab_tpu.video.encode import make_moving_shape_frames

DIFF_TOLERANCE = 24  # reference oracle uses per-pixel tolerance 21 (tests/utils.py)


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    """Two synthetic H.264 clips + their raw frames (the decode oracle)."""
    base = tmp_path_factory.mktemp("clips")
    paths, frames = [], []
    for i in range(2):
        f = make_moving_shape_frames(60, hw=(96, 128), seed=i)
        p = str(base / f"clip_{i}.mp4")
        write_video(p, f, fps=12, gop_size=15)
        paths.append(p)
        frames.append(f)
    return paths, frames


def assert_frame_close(decoded, original):
    decoded = np.asarray(decoded, np.int32)
    original = np.asarray(original, np.int32)
    assert decoded.shape == original.shape
    # mean abs diff tolerance (lossy codec)
    assert np.abs(decoded - original).mean() < DIFF_TOLERANCE


def test_encode_decode_roundtrip(clips):
    paths, frames = clips
    dec = GopDecoder()
    assert dec.GetNumFrames(paths[0]) == 60
    out = dec.Decode([paths[0]], [0])
    assert_frame_close(out[0], frames[0][0])


def test_random_access_mid_gop(clips):
    paths, frames = clips
    dec = GopDecoder()
    for fid in [7, 14, 15, 29, 44, 59]:
        out = dec.Decode([paths[0]], [fid])
        assert_frame_close(out[0], frames[0][fid])


def test_get_gop_metadata(clips):
    paths, _ = clips
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP(paths, [20, 35])
    assert firsts[0] == 15  # GOP 15 with gop_size=15
    assert firsts[1] == 30
    info = dec.ParseSerializedPacketBundle(merged)
    assert len(info) == 2
    assert info[0]["width"] == 128 and info[0]["height"] == 96


def test_decode_from_gop_bundle(clips):
    paths, frames = clips
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP(paths, [20, 35])
    out = dec.DecodeFromGOPRGB(merged, paths, [20, 35])
    assert_frame_close(out[0], frames[0][20])
    assert_frame_close(out[1], frames[1][35])


def test_decode_multiple_frames_per_gop(clips):
    paths, frames = clips
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP([paths[0]], [16])
    out = dec.DecodeFromGOPListRGB(merged, [[16, 18, 20]])
    for i, fid in enumerate([16, 18, 20]):
        assert_frame_close(out[0][i], frames[0][fid])


def test_save_load_packets(clips, tmp_path):
    paths, frames = clips
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP([paths[0]], [20])
    bundle_path = str(tmp_path / "gop.bin")
    dec.SavePacketsToFile(merged, bundle_path)
    loaded, firsts2, lens2 = dec.LoadGOPFromFiles([bundle_path])
    assert firsts2 == firsts and lens2 == lens
    out = dec.DecodeFromGOPRGB(loaded, [], [20])
    assert_frame_close(out[0], frames[0][20])


def test_gop_cache_hit_miss_lru(clips):
    paths, _ = clips
    dec = CreateGopDecoder(gopCacheCapacity=1)
    dec.GetGOP([paths[0]], [16], useGOPCache=True)
    assert dec.isCacheHit() == [False]
    dec.GetGOP([paths[0]], [20], useGOPCache=True)  # same GOP (15..29)
    assert dec.isCacheHit() == [True]
    dec.GetGOP([paths[0]], [31], useGOPCache=True)  # different GOP -> miss
    assert dec.isCacheHit() == [False]
    # capacity 1: caching the second file evicts the first
    dec.GetGOP([paths[1]], [16], useGOPCache=True)
    dec.GetGOP([paths[0]], [31], useGOPCache=True)
    assert dec.isCacheHit() == [False]
    info = dec.get_cache_info()
    assert info["cached_files_count"] == 1
    dec.clear_cache()
    assert dec.get_cache_info()["cached_files_count"] == 0


def test_sample_reader_sync_and_forward_decode(clips):
    paths, frames = clips
    reader = CreateSampleReader(max_readers=2)
    out = reader.run_rgb_out([paths[0], paths[1]], [5, 9])
    assert_frame_close(out[0], frames[0][5])
    assert_frame_close(out[1], frames[1][9])
    # sequential access uses forward decode (no re-seek) — just verify results
    out2 = reader.run_rgb_out([paths[0], paths[1]], [6, 10])
    assert_frame_close(out2[0], frames[0][6])
    reader.ReleaseResources()


def test_sample_reader_async_contract(clips):
    paths, frames = clips
    reader = CreateSampleReader()
    reader.DecodeAsync([paths[0]], [3])
    with pytest.raises(RuntimeError):
        reader.DecodeAsync([paths[0]], [4])  # one in flight only
    with pytest.raises(RuntimeError):
        reader.GetBuffer([paths[0]], [99])  # request mismatch
    out = reader.GetBuffer([paths[0]], [3])
    assert_frame_close(out[0], frames[0][3])
    with pytest.raises(RuntimeError):
        reader.GetBuffer([paths[0]], [3])  # nothing in flight anymore
    reader.ReleaseResources()


def test_batch_async_stream_reader(clips):
    paths, frames = clips
    reader = BatchAsyncStreamReader()
    ids = [[2, 3, 4], [10, 11, 12]]
    reader.Decode(paths, ids)
    out = reader.GetBuffer(paths, ids)
    assert len(out) == 2 and len(out[0]) == 3
    assert_frame_close(out[0][1], frames[0][3])
    assert_frame_close(out[1][2], frames[1][12])
    reader.ReleaseResources()


def test_shared_gop_store_roundtrip(clips):
    paths, frames = clips
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP([paths[0]], [20])
    store = SharedGopStore.create(capacity=4, store_id=91)
    try:
        assert store.lookup(paths[0], 20) is None
        ref = store.put(paths[0], firsts[0], lens[0], merged)
        hit = store.lookup(paths[0], 20)
        assert hit is not None and hit.first_frame_id == firsts[0]
        data = store.read(hit)
        np.testing.assert_array_equal(data, np.asarray(merged))
        # decode from the shared copy
        out = dec.DecodeFromGOPRGB(data, [], [20])
        assert_frame_close(out[0], frames[0][20])
        assert store.get_stats()["hit_count"] == 1
    finally:
        store.cleanup()


def test_shared_gop_store_lru_eviction(clips):
    paths, _ = clips
    store = SharedGopStore.create(capacity=2, store_id=92)
    try:
        a = np.arange(100, dtype=np.uint8)
        store.put("a.mp4", 0, 10, a)
        store.put("b.mp4", 0, 10, a)
        store.lookup("a.mp4", 5)  # bump a
        store.put("c.mp4", 0, 10, a)  # evicts b (LRU)
        assert store.lookup("b.mp4", 5) is None
        assert store.lookup("a.mp4", 5) is not None
        assert store.lookup("c.mp4", 5) is not None
    finally:
        store.cleanup()


def _store_worker(store_id, q):
    from accvlab_tpu.video import SharedGopStore

    s = SharedGopStore.attach(capacity=4, store_id=store_id)
    ref = s.put("w.mp4", 0, 30, np.arange(64, dtype=np.uint8))
    s.detach()
    q.put(ref)


def test_shared_gop_store_cross_process(clips):
    import multiprocessing as mp

    worker = _store_worker
    ctx = mp.get_context("spawn")
    store = SharedGopStore.create(capacity=4, store_id=93)
    try:
        q = ctx.Queue()
        p = ctx.Process(target=worker, args=(93, q))
        p.start()
        ref = q.get(timeout=30)
        p.join(timeout=30)
        data = store.read(ref)
        np.testing.assert_array_equal(data, np.arange(64, dtype=np.uint8))
        assert store.lookup("w.mp4", 10) is not None
    finally:
        store.cleanup()


def test_drop_videos_cache(clips):
    paths, _ = clips
    results = drop_videos_cache([paths[0], "/nonexistent/file.mp4"])
    from accvlab_tpu.video import DropCacheStatus

    assert results[0][1] == DropCacheStatus.SUCCESS
    assert results[1][1] == DropCacheStatus.FILE_NOT_FOUND


def test_corrupt_bundle_rejected():
    dec = GopDecoder()
    with pytest.raises((ValueError, RuntimeError)):
        dec.DecodeFromGOPRGB(np.zeros(64, np.uint8), [], [0])


def test_fast_init_info_and_frame_types(clips):
    """GetFastInitInfo probe + RGBFrame/DecodedFrameExt compat types
    (reference: PyNvGopDecoder_constructors.cpp:37, PyRGBFrame.hpp:31)."""
    import numpy as np

    from accvlab_tpu.video import (
        DecodedFrameExt,
        FastStreamInfo,
        GetFastInitInfo,
        RGBFrame,
        SavePacketsToFile,
    )

    paths, frames = clips
    infos = GetFastInitInfo(paths)
    assert len(infos) == len(paths)
    assert isinstance(infos[0], FastStreamInfo)
    assert infos[0].width == 128 and infos[0].height == 96
    assert infos[0].codec_type == 0 and infos[0].time_base_den > 0

    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP([paths[0]], [20], fastStreamInfos=[infos[0]])
    assert firsts[0] == 15

    # free-function save matches the method's on-disk format
    import tempfile, os

    d = tempfile.mkdtemp()
    SavePacketsToFile(merged, os.path.join(d, "g.bin"))
    loaded, f2, l2 = dec.LoadGOPFromFiles([os.path.join(d, "g.bin")])
    assert f2 == firsts and l2 == lens

    f = RGBFrame(frames[0][0])
    assert f.is_of_size(96, 128) and f.typestr == "|u1"
    np.testing.assert_array_equal(np.asarray(f), frames[0][0])
    assert DecodedFrameExt.ColorRange.LIMITED == 1
