"""Video robustness tests (model: reference pixel-format variants,
resource-free lifecycle, context-safety-across-threads tests)."""

import struct
import threading

import numpy as np
import pytest

from accvlab_tpu.video import CreateSampleReader, GopDecoder, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames


@pytest.fixture(scope="module")
def h264_clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("rb")
    frames = make_moving_shape_frames(45, hw=(64, 96), seed=3)
    path = str(base / "clip264.mp4")
    write_video(path, frames, gop_size=15, codec="libx264")
    return path, frames


def test_hevc_roundtrip(tmp_path):
    frames = make_moving_shape_frames(30, hw=(64, 96), seed=1)
    path = str(tmp_path / "clip265.mp4")
    try:
        write_video(path, frames, gop_size=10, codec="libx265")
    except RuntimeError as e:
        pytest.skip(f"libx265 encoder unavailable: {e}")
    dec = GopDecoder()
    out = dec.Decode([path], [17])
    diff = np.abs(out[0].astype(np.int32) - frames[17].astype(np.int32)).mean()
    assert diff < 24


def test_concurrent_decode_threads(h264_clip):
    """Parity intent: reference test_cuda_context_safty.py — concurrent use
    from multiple threads must be safe."""
    path, frames = h264_clip
    dec = GopDecoder(num_workers=4)
    errors = []

    def worker(fid):
        try:
            out = dec.Decode([path], [fid])
            diff = np.abs(out[0].astype(np.int32) - frames[fid].astype(np.int32)).mean()
            assert diff < 24
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(fid,)) for fid in [3, 17, 31, 40] * 2]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_resource_free_and_realloc(h264_clip):
    """Parity intent: reference test_stream_resource_free.py — release all
    resources, then continue using the object."""
    path, frames = h264_clip
    reader = CreateSampleReader(max_readers=2)
    out1 = reader.run_rgb_out([path], [5])
    reader.ReleaseResources()
    out2 = reader.run_rgb_out([path], [6])  # re-allocates readers transparently
    assert np.abs(out2[0].astype(np.int32) - frames[6].astype(np.int32)).mean() < 24
    reader.ReleaseResources()


def test_reader_map_round_robin_eviction(tmp_path):
    from accvlab_tpu.video.readers import FixedSizeReaderMap

    paths = []
    for i in range(3):
        frames = make_moving_shape_frames(10, hw=(48, 64), seed=i)
        p = str(tmp_path / f"e{i}.mp4")
        write_video(p, frames, gop_size=5)
        paths.append(p)
    m = FixedSizeReaderMap(capacity=2)
    r0 = m.get(paths[0])
    r1 = m.get(paths[1])
    r2 = m.get(paths[2])  # evicts paths[0]
    assert m.get(paths[1]) is r1
    assert m.get(paths[2]) is r2
    r0b = m.get(paths[0])  # re-opened
    assert r0b is not r0
    m.release()


def test_nonexistent_file_raises():
    dec = GopDecoder()
    with pytest.raises(RuntimeError):
        dec.Decode(["/nonexistent/clip.mp4"], [0])


def test_corrupt_file_raises(tmp_path):
    """Parity intent: reference test_corrupt_gop_demux.py."""
    bad = tmp_path / "garbage.mp4"
    bad.write_bytes(b"\x00\x01\x02definitely-not-a-video" * 100)
    dec = GopDecoder()
    with pytest.raises(RuntimeError):
        dec.Decode([str(bad)], [0])


@pytest.mark.parametrize(
    "label,opts",
    [
        ("closed_b", "max_b_frames=2,x264-params=bframes=2:b-adapt=0:scenecut=0"),
        ("open_gop", "max_b_frames=2,x264-params=open-gop=1:bframes=2:b-adapt=0:scenecut=0"),
    ],
)
def test_b_frame_and_open_gop_decode(tmp_path, label, opts):
    """Every frame of B-frame and open-GOP content decodes correctly: the GOP
    extractor includes overlap packets (next keyframe + leading B-frames)
    when display frames of a GOP decode after the next keyframe
    (reference: test_open_gop_overlap.py)."""
    from accvlab_tpu.video import write_video
    from accvlab_tpu.video.decoder import GopDecoder
    from accvlab_tpu.video.encode import make_moving_shape_frames

    frames = make_moving_shape_frames(45, hw=(96, 128))
    path = str(tmp_path / f"{label}.mp4")
    write_video(path, frames, fps=12, gop_size=15, options=opts)
    dec = GopDecoder()
    for fid in [0, 7, 13, 14, 15, 16, 28, 29, 30, 44]:
        out = dec.Decode([path], [fid])[0]
        err = np.abs(out.astype(int) - frames[fid].astype(int)).mean()
        assert err < 8.0, f"frame {fid} corrupt (err {err:.1f})"
    # cache-facing API covers GOP-boundary frames too
    merged, firsts, lens = dec.GetGOP([path], [16])
    multi = dec.DecodeFromGOPListRGB(merged, [[15, 22, 29]])
    for img, fid in zip(multi[0], [15, 22, 29]):
        assert np.abs(img.astype(int) - frames[fid].astype(int)).mean() < 8.0


def test_yuv444_source_decodes(tmp_path):
    """Non-420 chroma sources convert correctly (reference:
    test_pix_fmt_detection.py)."""
    from accvlab_tpu.video import GetFastInitInfo, write_video
    from accvlab_tpu.video.decoder import GopDecoder
    from accvlab_tpu.video.encode import make_moving_shape_frames

    frames = make_moving_shape_frames(20, hw=(96, 128))
    path = str(tmp_path / "yuv444.mp4")
    write_video(path, frames, fps=12, gop_size=10,
                options="pix_fmt=yuv444p,x264-params=scenecut=0")
    info = GetFastInitInfo([path])[0]
    import ctypes

    # AV_PIX_FMT_YUV444P == 5 in FFmpeg's pixfmt.h
    assert info.format == 5
    dec = GopDecoder()
    for fid in [0, 5, 9, 10, 19]:
        out = dec.Decode([path], [fid])[0]
        assert np.abs(out.astype(int) - frames[fid].astype(int)).mean() < 8.0


def test_truncated_and_corrupted_bundles_error_not_crash(h264_clip):
    """Regression (ADVICE r1): bundle parsing trusted header sizes unchecked —
    a truncated/corrupted GOP bundle from GopStore caused out-of-bounds reads.
    Every truncation point and fuzzed header must yield a Python error."""
    path, frames = h264_clip
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP([path], [17])
    bundle = np.asarray(merged, np.uint8).copy()
    assert dec.DecodeFromGOPRGB(merged, [path], [17])  # sanity: valid decodes

    rng = np.random.default_rng(0)
    # truncations at every interesting boundary + random points
    cut_points = [0, 1, 8, 20, 39, 40, len(bundle) // 2, len(bundle) - 1]
    cut_points += [int(rng.integers(1, len(bundle))) for _ in range(20)]
    for cut in cut_points:
        with pytest.raises((ValueError, RuntimeError)):
            GopDecoder._decode_bundle(bundle[:cut].tobytes(), [17], False)

    # fuzz header int fields (codec/width/height/frames/packets/extradata)
    for _ in range(40):
        fuzzed = bundle.copy()
        field = int(rng.integers(2, 10))  # skip magic/version words
        fuzzed[field * 4 : field * 4 + 4] = rng.integers(0, 256, 4, np.uint8)
        try:
            GopDecoder._decode_bundle(fuzzed.tobytes(), [17], False)
        except (ValueError, RuntimeError):
            pass  # error is the contract; a crash would kill the process

    # whole-bundle mutation fuzz: random byte flips anywhere, incl. the
    # packet table (uint64 size fields — the overflow-prone inputs) and
    # payloads (libav bitstream robustness). Contract: error or decode,
    # never crash/OOB (a segfault kills this process = test failure).
    for _ in range(150):
        fuzzed = bundle.copy()
        n_mut = int(rng.integers(1, 9))
        idx = rng.integers(0, len(fuzzed), n_mut)
        fuzzed[idx] = rng.integers(0, 256, n_mut, np.uint8)
        try:
            GopDecoder._decode_bundle(fuzzed.tobytes(), [17], False)
        except (ValueError, RuntimeError):
            pass

    # mutation fuzz of the merge container (offset table corruption)
    for _ in range(50):
        merged2 = np.asarray(
            GopDecoder.MergePacketDataToOne([bundle, bundle]), np.uint8
        ).copy()
        idx = rng.integers(0, min(64, len(merged2)), 4)  # hit the offset table
        merged2[idx] = rng.integers(0, 256, 4, np.uint8)
        try:
            for b in GopDecoder.ParseSerializedPacketBundle(merged2):
                pass
        except (ValueError, RuntimeError, struct.error):
            pass


def test_duplicate_target_frame_ids(h264_clip):
    """The same frame requested for several output slots must decode into
    each slot (was: rc=-6 'not all target frames decoded')."""
    path, frames = h264_clip
    dec = GopDecoder()
    merged, (first,), (length,) = dec.GetGOP([path], [17])
    a, b = first + 1, first + length - 1  # both inside this GOP
    out = dec.DecodeFromGOPListRGB(merged, [[a, a, b, a]])
    assert len(out[0]) == 4
    np.testing.assert_array_equal(out[0][0], out[0][1])
    np.testing.assert_array_equal(out[0][0], out[0][3])
    assert np.abs(out[0][2].astype(int) - frames[b].astype(int)).mean() < 24


def test_header_dims_mismatch_errors_not_overflow(h264_clip):
    """A bundle whose header claims smaller dims than the stream decodes
    must ERROR (was: heap overflow — to_rgb wrote stream-sized frames into
    a header-sized buffer; confirmed SIGSEGV before the fix)."""
    path, _ = h264_clip
    dec = GopDecoder()
    merged, _, _ = dec.GetGOP([path], [17])
    (meta,) = GopDecoder.ExtractPacketList(merged)
    dec.DecodeFromPacketListInitialize([meta["codec_id"]])
    with pytest.raises(RuntimeError, match="dimensions"):
        dec.DecodeFromPacketListRGB(
            [meta["packets"]],
            [list(range(len(meta["packets"])))],
            [16],   # lying width
            [16],   # lying height
            [17],
            metadatas=[meta],
        )


def test_header_count_bomb_errors_fast(h264_clip):
    """A corrupt num_frames (e.g. 2^30 from one 4-byte flip) must yield a
    fast error, not a multi-GB allocation (was: >300 s OOM hang)."""
    import struct as _struct
    import time as _time

    path, _ = h264_clip
    dec = GopDecoder()
    merged, _, _ = dec.GetGOP([path], [17])
    bundle = np.asarray(merged, np.uint8).copy()
    # BundleHeader field 6 (0-indexed int32 slot) = num_frames
    bundle[6 * 4 : 7 * 4] = np.frombuffer(_struct.pack("<i", 1 << 30), np.uint8)
    t0 = _time.perf_counter()
    with pytest.raises((ValueError, RuntimeError)):
        GopDecoder._decode_bundle(bundle.tobytes(), [17], False)
    assert _time.perf_counter() - t0 < 5.0
    # first_frame_id bomb: signed-overflow-prone values rejected too
    bundle2 = np.asarray(merged, np.uint8).copy()
    bundle2[5 * 4 : 6 * 4] = np.frombuffer(_struct.pack("<i", -2**31 + 7), np.uint8)
    with pytest.raises((ValueError, RuntimeError)):
        GopDecoder._decode_bundle(bundle2.tobytes(), [17], False)


# ------------------------- VFR (variable frame rate) -------------------- #
# Parity: the reference demuxer detects VFR (FFmpegDemuxer.h:451 area).
# Frame ids here are ranks in display-pts order, so addressing is VFR-safe
# by construction — these tests prove it with genuinely irregular deltas.


@pytest.fixture(scope="module")
def vfr_clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("vfr")
    frames = make_moving_shape_frames(30, hw=(64, 96), seed=21)
    path = str(base / "vfr.mp4")
    write_video(path, frames, fps=12, gop_size=10, options="vfr=1")
    return path, frames


def _best_match(img, frames):
    dists = [
        np.abs(np.asarray(img, np.int32) - np.asarray(f, np.int32)).mean()
        for f in frames
    ]
    return int(np.argmin(dists))


def test_vfr_detected(vfr_clip, h264_clip):
    path, _ = vfr_clip
    dec = GopDecoder()
    assert dec.GetIsVFR(path) is True
    assert dec.GetIsVFR(h264_clip[0]) is False


def test_vfr_frame_id_pts_mapping(vfr_clip):
    """Every frame id must map to ITS source frame (strict best-match) even
    though pts deltas cycle irregularly — a time-quotient-based mapping
    would alias under VFR."""
    path, frames = vfr_clip
    dec = GopDecoder()
    assert dec.GetNumFrames(path) == len(frames)
    ids = [0, 1, 7, 10, 15, 22, 29]
    out = dec.Decode([path] * len(ids), ids)
    for img, fid in zip(out, ids):
        assert _best_match(img, frames) == fid, f"frame {fid}"


def test_vfr_stream_reader_forward_and_reseek(vfr_clip):
    from accvlab_tpu.video.readers import _StreamReader

    path, frames = vfr_clip
    r = _StreamReader(path)
    try:
        for fid in (0, 3, 4, 12, 5, 29):  # forward runs + backward re-seeks
            img = r.read(fid)
            assert _best_match(img, frames) == fid, f"frame {fid}"
    finally:
        r.close()


def test_vfr_yuv_wire(vfr_clip):
    path, frames = vfr_clip
    dec = GopDecoder()
    (yf,) = dec.DecodeYUV([path], [13])
    assert _best_match(yf.to_rgb(), frames) == 13


# -------------------- mid-stream payload corruption --------------------- #


def test_midstream_payload_corruption_error_or_decode(h264_clip):
    """Bit flips INSIDE packet payloads (not header/table truncation): the
    decoder must either raise a Python error or return a frame — never
    crash, hang, or read out of bounds. Model: reference
    test_corrupt_gop_demux.py, extended beyond truncation."""
    path, _ = h264_clip
    dec = GopDecoder()
    packets, (first,), (length,) = dec.GetGOP([path], [20])
    buf = np.asarray(packets, np.uint8)
    # payload region = after header+extradata+packet table; flip bytes at
    # several depths including the keyframe's slice data
    hdr_end = 40  # sizeof(BundleHeader)
    rng = np.random.default_rng(0)
    for offset in [hdr_end + 200, buf.nbytes // 2, buf.nbytes - 17]:
        for flip in (0xFF, 0x55):
            fuzzed = buf.copy()
            fuzzed[offset] ^= flip
            # a handful of random extra flips around the point
            for j in rng.integers(max(hdr_end, offset - 64), offset, 4):
                fuzzed[j] ^= 0xA5
            try:
                out = dec.DecodeFromGOPRGB(fuzzed, [path], [20])
                assert out[0].shape[2] == 3  # decoded something frame-shaped
            except (RuntimeError, ValueError):
                pass  # error is acceptable; crash/hang is not


def test_midstream_corruption_many_random_points(h264_clip):
    path, _ = h264_clip
    dec = GopDecoder()
    packets, (first,), _ = dec.GetGOP([path], [5])
    buf = np.asarray(packets, np.uint8)
    rng = np.random.default_rng(1)
    for _ in range(24):
        fuzzed = buf.copy()
        n_flips = int(rng.integers(1, 16))
        idxs = rng.integers(0, buf.nbytes, n_flips)
        fuzzed[idxs] ^= rng.integers(1, 256, n_flips).astype(np.uint8)
        try:
            dec.DecodeFromGOPRGB(fuzzed, [path], [5])
        except (RuntimeError, ValueError):
            pass
