"""Async stream-reader request matrix (model: reference
``test_stream_asnyc_decoder.py`` Section F and
``test_batch_async_stream_decoder.py`` Sections A-C: construction sizing,
Decode() entry validation, maintenance methods, error preservation across
the async boundary, async==sync results)."""

import numpy as np
import pytest

from accvlab_tpu.video import (
    BatchAsyncStreamReader,
    CreateBatchAsyncStreamReader,
    CreateSampleReader,
    SampleReader,
    write_video,
)
from accvlab_tpu.video.encode import make_moving_shape_frames


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    base = tmp_path_factory.mktemp("async_clips")
    paths, frames = [], []
    for i in range(3):
        f = make_moving_shape_frames(40, hw=(64, 96), seed=10 + i)
        p = str(base / f"clip_{i}.mp4")
        write_video(p, f, fps=12, gop_size=10)
        paths.append(p)
        frames.append(f)
    return paths, frames


# ------------------------- construction sizing ------------------------- #


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(max_readers=0),
        dict(max_readers=-1),
        dict(num_workers=0),
        dict(num_workers=-2),
    ],
)
def test_sample_reader_rejects_invalid_sizing(kwargs):
    with pytest.raises((ValueError, RuntimeError)):
        SampleReader(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(max_readers=0),
        dict(num_workers=0),
        dict(max_frames_per_decode_call=0),
        dict(max_frames_per_decode_call=-1),
    ],
)
def test_batch_reader_rejects_invalid_sizing(kwargs):
    with pytest.raises((ValueError, RuntimeError)):
        BatchAsyncStreamReader(**kwargs)


def test_factories_construct_valid():
    r = CreateSampleReader(max_readers=2, num_workers=1)
    b = CreateBatchAsyncStreamReader(max_readers=2, num_workers=1)
    for obj in (r, b):
        methods = {m for m in dir(obj) if not m.startswith("_")}
        assert {"GetBuffer", "ReleaseResources", "clearAllReaders",
                "release_device_memory", "release_decoder"} <= methods


def test_destructor_clean():
    r = BatchAsyncStreamReader(max_readers=1, num_workers=1)
    del r


# ---------------------- Decode() entry validation ---------------------- #


def test_batch_validate_size_mismatch(clips):
    paths, _ = clips
    r = BatchAsyncStreamReader(max_readers=len(paths))
    with pytest.raises(RuntimeError, match=r"filepaths\.size\(\).*frame_ids_2d\.size\(\)"):
        r.Decode(paths, [[0]])


def test_batch_validate_empty_filepaths():
    r = BatchAsyncStreamReader()
    with pytest.raises(RuntimeError, match="filepaths must not be empty"):
        r.Decode([], [])


def test_batch_validate_too_many_files(clips):
    paths, _ = clips
    r = BatchAsyncStreamReader(max_readers=1)
    with pytest.raises(RuntimeError, match="exceeds num_of_file"):
        r.Decode(paths, [[0]] * len(paths))


def test_batch_validate_too_many_frames(clips):
    paths, _ = clips
    r = BatchAsyncStreamReader(max_readers=len(paths), max_frames_per_decode_call=4)
    with pytest.raises(RuntimeError, match="exceeds max_frames_per_decode_call"):
        r.Decode(paths, [list(range(30))] * len(paths))


def test_batch_validate_jagged_inner_lengths(clips):
    paths, _ = clips
    r = BatchAsyncStreamReader(max_readers=len(paths))
    jagged = [[0, 7, 14], [0, 7]] + [[0, 7, 14]] * (len(paths) - 2)
    with pytest.raises(RuntimeError, match="jagged inner lengths are not supported"):
        r.Decode(paths, jagged)


def test_batch_validate_empty_inner_list(clips):
    paths, _ = clips
    r = BatchAsyncStreamReader(max_readers=len(paths))
    with pytest.raises(RuntimeError, match=r"frame_ids_2d\[0\] must not be empty"):
        r.Decode(paths, [[]] * len(paths))


def test_sample_validate_size_mismatch(clips):
    paths, _ = clips
    r = SampleReader(max_readers=len(paths))
    with pytest.raises(RuntimeError, match=r"filepaths\.size\(\).*frame_ids\.size\(\)"):
        r.DecodeAsync(paths, [0])
    with pytest.raises(RuntimeError, match=r"filepaths\.size\(\).*frame_ids\.size\(\)"):
        r.run_rgb_out(paths, [0])


def test_sample_validate_empty_and_too_many(clips):
    paths, _ = clips
    r = SampleReader(max_readers=1)
    with pytest.raises(RuntimeError, match="filepaths must not be empty"):
        r.DecodeAsync([], [])
    with pytest.raises(RuntimeError, match="exceeds num_of_file"):
        r.DecodeAsync(paths, [0] * len(paths))


# ------------------------- maintenance methods ------------------------- #


def test_maintenance_idle_callable():
    for r in (SampleReader(max_readers=2), BatchAsyncStreamReader(max_readers=2)):
        r.clearAllReaders()
        r.release_device_memory()
        r.release_decoder()
        # order-independent and idempotent
        r.release_decoder()
        r.clearAllReaders()
        r.release_device_memory()


def test_release_then_continue_decode(clips):
    paths, frames = clips
    r = SampleReader(max_readers=len(paths))
    out1 = r.run_rgb_out(paths[:1], [0])
    r.release_decoder()
    out2 = r.run_rgb_out(paths[:1], [0])
    np.testing.assert_array_equal(out1[0], out2[0])


# -------------------- async behavior / error paths --------------------- #


def test_async_basic_and_prefetch_flow(clips):
    paths, _ = clips
    r = SampleReader(max_readers=len(paths))
    # basic: enqueue -> fetch
    r.DecodeAsync(paths, [0] * len(paths))
    out = r.GetBuffer(paths, [0] * len(paths))
    assert len(out) == len(paths)
    # prefetch flow: enqueue next while consuming current
    r.DecodeAsync(paths, [5] * len(paths))
    out5 = r.GetBuffer(paths, [5] * len(paths))
    r.DecodeAsync(paths, [6] * len(paths))
    out6 = r.GetBuffer(paths, [6] * len(paths))
    assert out5[0].shape == out6[0].shape


def test_async_getbuffer_on_empty_throws(clips):
    paths, _ = clips
    r = SampleReader(max_readers=len(paths))
    with pytest.raises(RuntimeError, match="No decode request in flight"):
        r.GetBuffer(paths, [0] * len(paths))
    b = BatchAsyncStreamReader(max_readers=len(paths))
    with pytest.raises(RuntimeError, match="No decode request in flight"):
        b.GetBuffer(paths, [[0]] * len(paths))


@pytest.mark.parametrize("mutate", ["filepath", "frameid", "bgr", "listsize"])
def test_async_request_mismatch_matrix(clips, mutate):
    paths, _ = clips
    r = SampleReader(max_readers=len(paths))
    fids = [0] * len(paths)
    r.DecodeAsync(paths, fids, as_bgr=False)
    bad_paths, bad_fids, bad_bgr = list(paths), list(fids), False
    if mutate == "filepath":
        bad_paths = list(reversed(paths))
    elif mutate == "frameid":
        bad_fids = [1] * len(paths)
    elif mutate == "bgr":
        bad_bgr = True
    elif mutate == "listsize":
        bad_paths, bad_fids = paths[:1], fids[:1]
    with pytest.raises(RuntimeError, match="does not match"):
        r.GetBuffer(bad_paths, bad_fids, as_bgr=bad_bgr)
    # the slot stays consumable with the CORRECT request afterwards
    out = r.GetBuffer(paths, fids, as_bgr=False)
    assert len(out) == len(paths)


def test_async_error_handling_invalid_file(clips):
    paths, _ = clips
    r = SampleReader(max_readers=4)
    r.DecodeAsync(["/nonexistent/not_a_video.mp4"], [0])
    with pytest.raises(RuntimeError) as err:
        r.GetBuffer(["/nonexistent/not_a_video.mp4"], [0])
    # error message is preserved across the async boundary
    assert "not_a_video" in str(err.value) or "Cannot open" in str(err.value)
    # reader remains usable after the failure
    r.DecodeAsync(paths[:1], [0])
    assert len(r.GetBuffer(paths[:1], [0])) == 1


def test_async_error_handling_invalid_frame_id(clips):
    paths, _ = clips
    r = SampleReader(max_readers=len(paths))
    r.DecodeAsync(paths[:1], [10_000])
    with pytest.raises(RuntimeError):
        r.GetBuffer(paths[:1], [10_000])


def test_async_vs_sync_result_comparison(clips):
    paths, _ = clips
    fids = [3, 17, 25]
    sync_reader = SampleReader(max_readers=len(paths))
    got_sync = sync_reader.run_rgb_out(paths, fids)
    async_reader = SampleReader(max_readers=len(paths))
    async_reader.DecodeAsync(paths, fids)
    got_async = async_reader.GetBuffer(paths, fids)
    for a, s in zip(got_async, got_sync):
        np.testing.assert_array_equal(a, s)


def test_async_multiple_frames_sequential(clips):
    paths, frames = clips
    r = SampleReader(max_readers=len(paths))
    for fid in (0, 1, 2, 7, 8):
        r.DecodeAsync(paths[:1], [fid])
        (frame,) = r.GetBuffer(paths[:1], [fid])
        ref = frames[0][fid].astype(np.int32)
        assert np.abs(frame.astype(np.int32) - ref).mean() < 24


def test_batch_async_vs_sequential_1d_bit_match(clips):
    """2D batch decode must bit-match sequential 1D calls (reference
    Section E precision contract)."""
    paths, _ = clips
    fids_2d = [[0, 7, 14]] * len(paths)
    b = BatchAsyncStreamReader(max_readers=len(paths))
    b.Decode(paths, fids_2d)
    out2d = b.GetBuffer(paths, fids_2d)
    s = SampleReader(max_readers=len(paths))
    for f_idx, fid in enumerate([0, 7, 14]):
        frames_1d = s.run_rgb_out(paths, [fid] * len(paths))
        for v in range(len(paths)):
            np.testing.assert_array_equal(out2d[v][f_idx], frames_1d[v])
