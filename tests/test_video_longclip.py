"""Long-clip stress (model: reference long-clip/cache-pressure coverage —
many-GOP files, deep random access, full sequential passes, cache churn).

Sized to stay tractable on the 1-core CI host while still covering
hundreds of GOPs; the clip length can be raised via ACCVLAB_LONGCLIP_FRAMES
for soak runs on bigger hosts.
"""

import os

import numpy as np
import pytest

from accvlab_tpu.video import CreateGopDecoder, GopDecoder, write_video
from accvlab_tpu.video.decoder import CachedGopDecoder
from accvlab_tpu.video.encode import make_moving_shape_frames
from accvlab_tpu.video.readers import FixedSizeReaderMap

NUM_FRAMES = int(os.environ.get("ACCVLAB_LONGCLIP_FRAMES", "600"))
GOP = 12  # 50 GOPs at the default length
HW = (72, 96)


@pytest.fixture(scope="module")
def long_clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("longclip")
    frames = make_moving_shape_frames(NUM_FRAMES, hw=HW, seed=99)
    path = str(base / "long.mp4")
    write_video(path, frames, fps=24, gop_size=GOP)
    return path, frames


def test_metadata_across_many_gops(long_clip):
    path, frames = long_clip
    dec = GopDecoder()
    assert dec.GetNumFrames(path) == NUM_FRAMES
    h, w = dec.GetFrameSize(path)
    assert (h, w) == HW


def test_deep_random_access(long_clip):
    """Random frames spread over the whole file decode correctly — every
    decode must seek to the right GOP, including the last one."""
    path, frames = long_clip
    dec = CreateGopDecoder(gopCacheCapacity=8)
    rng = np.random.default_rng(0)
    fids = sorted(set(rng.integers(0, NUM_FRAMES, 24).tolist()) | {0, NUM_FRAMES - 1})
    for fid in fids:
        packets, _, _ = dec.GetGOP([path], [fid])
        (img,) = dec.DecodeFromGOPRGB(packets, [path], [fid])
        ref = frames[fid].astype(np.int32)
        assert np.abs(np.asarray(img).astype(np.int32) - ref).mean() < 24, fid


def test_cache_churn_many_gops(long_clip):
    """Striding through far more GOPs than the cache holds: every access is
    correct, cache stays bounded, hit-rate telemetry is sane."""
    path, frames = long_clip
    dec = CreateGopDecoder(gopCacheCapacity=4)
    assert isinstance(dec, CachedGopDecoder)
    # two passes: first all misses (churn), second identical -> partial hits
    fids = list(range(0, NUM_FRAMES, GOP * 3))
    for _ in range(2):
        for fid in fids:
            packets, _, _ = dec.GetGOP([path], [fid])
            (img,) = dec.DecodeFromGOPRGB(packets, [path], [fid])
            ref = frames[fid].astype(np.int32)
            assert np.abs(np.asarray(img).astype(np.int32) - ref).mean() < 24
    info = dec.get_cache_info()
    assert info["cached_files_count"] <= 4


def test_full_sequential_pass(long_clip):
    """A stream reader plays the clip end to end without re-seeking; spot
    frames verified against the source."""
    path, frames = long_clip
    readers = FixedSizeReaderMap(1)
    r = readers.get(path)
    check = {0, 1, GOP - 1, GOP, NUM_FRAMES // 2, NUM_FRAMES - 1}
    for fid in range(NUM_FRAMES):
        img = r.read(fid)
        if fid in check:
            ref = frames[fid].astype(np.int32)
            assert np.abs(img.astype(np.int32) - ref).mean() < 24, fid
    readers.release()
