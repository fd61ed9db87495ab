"""Cross-validate the video engine against OpenCV's decoder (independent).

The existing video suite orackles against the pre-encode source frames
(codec-roundtrip tolerance); both sides of that check run through OUR
libav engine. This file decodes the SAME files with ``cv2.VideoCapture``
(OpenCV's own FFmpeg integration + its own color conversion) — the
reference validates its NVDEC path exactly this way
(``on_demand_video_decoder/tests/utils.py:7-42``). Two distinct failure
classes this catches that a roundtrip cannot:

* frame-indexing bugs in GOP random access (an off-by-one returns a
  *valid* frame that still passes a loose roundtrip tolerance on slow
  content — vs cv2's sequential ground truth it is a large diff);
* systematic YUV->RGB conversion errors (range/matrix/chroma-siting).

The H.264 bitstream decode itself is bit-deterministic across FFmpeg
builds, so remaining differences are conversion rounding only — the
comparison tolerance is tight.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from accvlab_tpu.video import GopDecoder, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("cv2clips")
    frames = make_moving_shape_frames(48, hw=(96, 128), seed=5)
    path = str(base / "clip.mp4")
    write_video(path, frames, fps=12, gop_size=12)
    return path


def _cv2_all_frames(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, bgr = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def test_random_access_matches_cv2_sequential(clip):
    oracle = _cv2_all_frames(clip)
    assert len(oracle) == 48
    dec = GopDecoder()
    # mid-GOP, GOP-boundary, first, last — the indexing-sensitive spots
    for fid in [0, 5, 11, 12, 23, 24, 37, 47]:
        ours = np.asarray(dec.Decode([clip], [fid])[0], np.int16)
        ref = oracle[fid].astype(np.int16)
        assert ours.shape == ref.shape
        diff = np.abs(ours - ref)
        # same bitstream decode, independent YUV->RGB conversion: rounding
        assert diff.mean() < 2.0, (fid, float(diff.mean()))
        assert np.percentile(diff, 99.9) <= 8, (fid, float(np.percentile(diff, 99.9)))
        # an off-by-one frame on this moving-shape content is a huge diff:
        # prove the tolerance actually separates neighbors
        if 0 < fid < 47:
            neighbor = oracle[fid - 1].astype(np.int16)
            assert np.abs(neighbor - ref).mean() > 4.0, "content too static"


def test_batch_decode_matches_cv2(clip):
    oracle = _cv2_all_frames(clip)
    dec = GopDecoder()
    fids = [3, 17, 30, 46]
    outs = dec.Decode([clip] * len(fids), fids)
    for fid, ours in zip(fids, outs):
        diff = np.abs(np.asarray(ours, np.int16) - oracle[fid].astype(np.int16))
        assert diff.mean() < 2.0, (fid, float(diff.mean()))


def test_hevc_random_access_matches_cv2(tmp_path):
    """Same oracle on HEVC (the reference's other primary codec): this
    FFmpeg pairing decodes bit-identically, so the comparison is exact."""
    frames = make_moving_shape_frames(24, hw=(96, 128), seed=11)
    path = str(tmp_path / "clip_hevc.mp4")
    write_video(
        path, frames, fps=12, gop_size=8, codec="libx265",
        options="pix_fmt=yuv420p,x265-params=log-level=none",
    )
    oracle = _cv2_all_frames(path)
    assert len(oracle) == 24
    dec = GopDecoder()
    for fid in [0, 7, 8, 15, 23]:
        ours = np.asarray(dec.Decode([path], [fid])[0], np.int16)
        diff = np.abs(ours - oracle[fid].astype(np.int16))
        assert diff.mean() < 2.0, (fid, float(diff.mean()))
