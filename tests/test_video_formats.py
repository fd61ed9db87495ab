"""Pixel-format / codec breadth + cache-capacity tests.

Model: the reference's ``tests/data/pix_fmt_variants/`` matrix (h264/hevc x
yuv420p/yuv420p10le), AV1 support (``types.py:44-54``: Codec.av1 = 11), and
``test_gop_cache_capacity.py`` (LRU eviction at gopCacheCapacity). The
reference commits pre-generated clips; here every variant is encoded on the
fly by the engine's test-asset encoder so the repo stays binary-free.
"""

import numpy as np
import pytest

from accvlab_tpu.video import (
    Codec,
    CreateGopDecoder,
    CreateSampleReader,
    GetFastInitInfo,
    GopDecoder,
    write_video,
)
from accvlab_tpu.video.encode import make_moving_shape_frames

DIFF_TOLERANCE = 24  # same oracle tolerance as test_video.py


def assert_frame_close(decoded, original):
    decoded = np.asarray(decoded, np.int32)
    original = np.asarray(original, np.int32)
    assert decoded.shape == original.shape
    assert np.abs(decoded - original).mean() < DIFF_TOLERANCE


# x265 logs directly to stderr regardless of av_log level; silence it so the
# suite output stays readable.
_X265_QUIET = "x265-params=log-level=none"

PIX_FMT_MATRIX = [
    ("libx264", "yuv420p", "pix_fmt=yuv420p"),
    ("libx264", "yuv420p10le", "pix_fmt=yuv420p10le"),
    ("libx265", "yuv420p", f"pix_fmt=yuv420p,{_X265_QUIET}"),
    ("libx265", "yuv420p10le", f"pix_fmt=yuv420p10le,{_X265_QUIET}"),
    ("libx265", "yuv444p10le", f"pix_fmt=yuv444p10le,{_X265_QUIET}"),
]


@pytest.mark.parametrize("codec,fmt,opts", PIX_FMT_MATRIX, ids=lambda v: str(v))
def test_pix_fmt_variant_random_access(tmp_path, codec, fmt, opts):
    """Every (codec, pixel format) variant decodes correctly mid-GOP through
    the bundle path (the 10-bit rows are the reference's pix_fmt_variants)."""
    frames = make_moving_shape_frames(24, hw=(64, 96), seed=7)
    path = str(tmp_path / f"{codec}_{fmt}.mp4")
    write_video(path, frames, fps=12, gop_size=8, codec=codec, options=opts)

    dec = GopDecoder()
    assert dec.GetNumFrames(path) == 24
    for fid in [0, 5, 9, 17, 23]:
        out = dec.Decode([path], [fid])
        assert_frame_close(out[0], frames[fid])


@pytest.fixture(scope="module")
def av1_clip(tmp_path_factory):
    """AV1 clip (libaom realtime encode; decoded by libdav1d/native av1)."""
    base = tmp_path_factory.mktemp("av1")
    frames = make_moving_shape_frames(24, hw=(64, 96), seed=11)
    path = str(base / "clip_av1.mp4")
    write_video(
        path,
        frames,
        fps=12,
        gop_size=8,
        codec="libaom-av1",
        options="usage=realtime,cpu-used=8,row-mt=1",
    )
    return path, frames


def test_av1_codec_identification(av1_clip):
    path, _ = av1_clip
    info = GetFastInitInfo([path])[0]
    assert Codec.from_avcodec_id(info.codec_id) == Codec.av1
    dec = GopDecoder()
    merged, _, _ = dec.GetGOP([path], [10])
    bundle = dec.ParseSerializedPacketBundle(merged)[0]
    assert Codec.from_avcodec_id(bundle["codec_id"]) == Codec.av1


def test_av1_random_access_decode(av1_clip):
    path, frames = av1_clip
    dec = GopDecoder()
    for fid in [0, 6, 9, 15, 23]:
        out = dec.Decode([path], [fid])
        assert_frame_close(out[0], frames[fid])


def test_av1_gop_bundle_roundtrip(av1_clip, tmp_path):
    """GOP extraction + save/load + demuxer-free decode all work for AV1."""
    path, frames = av1_clip
    dec = GopDecoder()
    merged, firsts, lens = dec.GetGOP([path], [10])
    assert firsts[0] == 8 and lens[0] >= 1
    out = dec.DecodeFromGOPRGB(merged, [path], [10])
    assert_frame_close(out[0], frames[10])

    bundle_file = str(tmp_path / "gop_av1.bin")
    dec.SavePacketsToFile(merged, bundle_file)
    loaded, lfirsts, llens = dec.LoadGOPFromFiles([bundle_file])
    assert lfirsts == firsts and llens == lens
    out2 = dec.DecodeFromGOPRGB(loaded, [path], [12])
    assert_frame_close(out2[0], frames[12])


def test_av1_stream_reader_forward_decode(av1_clip):
    path, frames = av1_clip
    reader = CreateSampleReader(max_readers=1)
    out = reader.run_rgb_out([path], [4])
    assert_frame_close(out[0], frames[4])
    out2 = reader.run_rgb_out([path], [5])  # forward decode, no re-seek
    assert_frame_close(out2[0], frames[5])
    out3 = reader.run_rgb_out([path], [2])  # backward -> GOP re-seek
    assert_frame_close(out3[0], frames[2])
    reader.ReleaseResources()


def test_10bit_stream_reader(tmp_path):
    frames = make_moving_shape_frames(16, hw=(64, 96), seed=13)
    path = str(tmp_path / "clip10.mp4")
    write_video(
        path, frames, fps=12, gop_size=8, codec="libx264",
        options="pix_fmt=yuv420p10le",
    )
    reader = CreateSampleReader(max_readers=1)
    out = reader.run_rgb_out([path], [9])
    assert_frame_close(out[0], frames[9])
    reader.ReleaseResources()


def test_gop_cache_lru_capacity(tmp_path):
    """LRU eviction at gopCacheCapacity (parity:
    ``test_gop_cache_capacity.py:21-50``): with capacity 2 and three files,
    touching file0 keeps it resident and fetching file2 evicts file1."""
    paths, frames = [], []
    for i in range(3):
        f = make_moving_shape_frames(24, hw=(64, 96), seed=20 + i)
        p = str(tmp_path / f"cap_{i}.mp4")
        write_video(p, f, fps=12, gop_size=8)
        paths.append(p)
        frames.append(f)

    decoder = CreateGopDecoder(maxfiles=6, iGpu=0, gopCacheCapacity=2)

    decoder.GetGOPList([paths[0]], [10], useGOPCache=True)
    decoder.GetGOPList([paths[1]], [10], useGOPCache=True)

    info = decoder.get_cache_info()
    assert info["cache_capacity"] == 2
    assert info["cached_files_count"] == 2
    assert paths[0] in info["cached_files"]
    assert paths[1] in info["cached_files"]

    first_info = info["cached_files"][paths[0]]
    decoder.GetGOPList(
        [paths[0]], [first_info["first_frame_id"]], useGOPCache=True
    )
    assert decoder.isCacheHit() == [True]

    decoder.GetGOPList([paths[2]], [10], useGOPCache=True)

    info = decoder.get_cache_info()
    assert info["cached_files_count"] == 2
    assert paths[0] in info["cached_files"]  # LRU-bumped, survives
    assert paths[2] in info["cached_files"]
    assert paths[1] not in info["cached_files"]  # evicted

    # evicted file still decodes correctly (miss path)
    out = decoder.Decode([paths[1]], [10])
    assert_frame_close(out[0], frames[1][10])


def test_cache_capacity_one_thrash(tmp_path):
    """Working set larger than capacity: every alternating access is a miss,
    results stay correct (capacity-bound regime of the reference test)."""
    paths, frames = [], []
    for i in range(2):
        f = make_moving_shape_frames(16, hw=(64, 96), seed=30 + i)
        p = str(tmp_path / f"thrash_{i}.mp4")
        write_video(p, f, fps=12, gop_size=8)
        paths.append(p)
        frames.append(f)

    decoder = CreateGopDecoder(maxfiles=4, gopCacheCapacity=1)
    for fid, which in [(3, 0), (3, 1), (4, 0), (4, 1)]:
        merged, firsts, lens = decoder.GetGOP(
            [paths[which]], [fid], useGOPCache=True
        )
        assert decoder.isCacheHit() == [False]  # always evicted in between
        out = decoder.DecodeFromGOPRGB(merged, [paths[which]], [fid])
        assert_frame_close(out[0], frames[which][fid])
    # same-file immediate re-access IS a hit
    decoder.GetGOP([paths[1]], [5], useGOPCache=True)
    decoder.GetGOP([paths[1]], [6], useGOPCache=True)
    assert decoder.isCacheHit() == [True]


@pytest.mark.parametrize("codec,fmt,opts", PIX_FMT_MATRIX, ids=lambda v: str(v))
def test_pix_fmt_variant_fused_resize(tmp_path, codec, fmt, opts):
    """out_hw (fused decode+resize) across the codec/bit-depth matrix: RGB
    and YUV-wire outputs land at the target size with area-averaged content
    (10-bit sources dither down to 8 inside swscale)."""
    frames = make_moving_shape_frames(16, hw=(64, 96), seed=9)
    path = str(tmp_path / f"{codec}_{fmt}_rs.mp4")
    write_video(path, frames, fps=12, gop_size=8, codec=codec, options=opts)

    dec = GopDecoder()
    for fid in (3, 11):
        [rgb] = dec.Decode([path], [fid], out_hw=(32, 48))
        assert rgb.shape == (32, 48, 3)
        src = frames[fid].reshape(32, 2, 48, 2, 3).astype(np.float64).mean(axis=(1, 3))
        assert np.abs(rgb.astype(np.float64) - src).mean() < DIFF_TOLERANCE
        [yf] = dec.DecodeYUV([path], [fid], out_hw=(32, 48))
        assert yf.y.shape == (32, 48) and yf.cbcr.shape == (16, 24, 2)
        assert np.abs(yf.to_rgb().astype(np.float64) - src).mean() < DIFF_TOLERANCE


def test_av1_fused_resize(av1_clip):
    path, frames = av1_clip
    dec = GopDecoder()
    [rgb] = dec.Decode([path], [7], out_hw=(32, 48))
    assert rgb.shape == (32, 48, 3)
    src = frames[7].reshape(32, 2, 48, 2, 3).astype(np.float64).mean(axis=(1, 3))
    assert np.abs(rgb.astype(np.float64) - src).mean() < DIFF_TOLERANCE
