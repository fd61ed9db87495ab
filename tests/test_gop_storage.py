"""GOPStorageManager (demuxer-free persistence) — model: reference
``examples/demuxer_free_decode/gop_storage.py`` workflow: extract once,
persist with a JSON index, reload in a fresh process/instance, decode with
no demux."""

import json
import os

import numpy as np
import pytest

from accvlab_tpu.video import GOPStorageManager, GopDecoder, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    base = tmp_path_factory.mktemp("gsm")
    paths, frames = [], []
    for i in range(2):
        f = make_moving_shape_frames(40, hw=(64, 96), seed=20 + i)
        p = str(base / f"clip_{i}.mp4")
        write_video(p, f, fps=12, gop_size=10)
        paths.append(p)
        frames.append(f)
    return paths, frames


def test_store_load_decode_roundtrip(clips, tmp_path):
    paths, frames = clips
    mgr = GOPStorageManager(str(tmp_path / "store"))
    stored = mgr.store_gops(paths[0], [3, 17, 35])
    assert stored >= 1
    # decode without touching the original video (demuxer-free)
    out = mgr.decode([paths[0]] * 3, [3, 17, 35])
    for img, fid in zip(out, [3, 17, 35]):
        assert np.abs(np.asarray(img, np.int32) - frames[0][fid].astype(np.int32)).mean() < 24


def test_store_dedup_and_stats(clips, tmp_path):
    paths, _ = clips
    mgr = GOPStorageManager(str(tmp_path / "store"))
    first = mgr.store_gops(paths[0], [3, 5, 7])  # same GOP
    again = mgr.store_gops(paths[0], [4])        # still the same GOP
    assert first == 1 and again == 0
    stats = mgr.get_gop_stats(paths[0])
    assert stats["total_gops"] == 1
    lo, hi = stats["frame_ranges"][0]
    assert lo <= 3 and hi >= 7


def test_index_persists_across_instances(clips, tmp_path):
    paths, frames = clips
    d = str(tmp_path / "store")
    GOPStorageManager(d).store_gops(paths[1], [12])
    # fresh instance (fresh process analog) reads the JSON index
    mgr2 = GOPStorageManager(d)
    merged, firsts, lens = mgr2.load_gops_fast([paths[1]], [12])
    assert firsts[0] <= 12 < firsts[0] + lens[0]
    (img,) = GopDecoder().DecodeFromGOPRGB(merged, [paths[1]], [12])
    assert np.abs(img.astype(np.int32) - frames[1][12].astype(np.int32)).mean() < 24
    # and the index file itself is well-formed JSON
    with open(os.path.join(d, GOPStorageManager.INDEX_NAME)) as f:
        idx = json.load(f)
    assert paths[1] in idx


def test_load_missing_returns_none_or_raises(clips, tmp_path):
    paths, _ = clips
    mgr = GOPStorageManager(str(tmp_path / "store"))
    assert mgr.load_gops([0], [paths[0]]) is None
    with pytest.raises(KeyError):
        mgr.load_gops_fast([paths[0]], [0])


def test_store_single_gop_prefetched(clips, tmp_path):
    paths, frames = clips
    mgr = GOPStorageManager(str(tmp_path / "store"))
    dec = GopDecoder()
    packets = dec.GetGOP([paths[0]], [25])
    assert mgr.store_single_gop("clipA", paths[0], packets)
    out = mgr.decode([paths[0]], [25])
    assert np.abs(np.asarray(out[0], np.int32) - frames[0][25].astype(np.int32)).mean() < 24
    # stored under the clip-name prefix
    assert any(f.startswith("clipA_") for f in os.listdir(str(tmp_path / "store")))
