"""Separate-decoder workflows (model: reference ``test_separate_decoder.py``
— demux once, persist/ship packets, decode elsewhere; packet-list decode
with metadata roundtrip; LoadGops/LoadGopsToList API combinations)."""

import numpy as np
import pytest

from accvlab_tpu.video import GopDecoder, write_video
from accvlab_tpu.video.encode import make_moving_shape_frames

TOL = 24


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    base = tmp_path_factory.mktemp("sep")
    frames = make_moving_shape_frames(48, hw=(64, 96), seed=3)
    path = str(base / "clip.mp4")
    write_video(path, frames, fps=12, gop_size=12)
    return path, frames


@pytest.fixture(scope="module")
def bclip(tmp_path_factory):
    """Open-GOP/B-frame content — exercises the metadata path."""
    base = tmp_path_factory.mktemp("sepb")
    frames = make_moving_shape_frames(48, hw=(64, 96), seed=4)
    path = str(base / "bclip.mp4")
    write_video(
        path, frames, fps=12, gop_size=12,
        options="max_b_frames=2,x264-params=bframes=2:b-adapt=0:scenecut=0",
    )
    return path, frames


def close(img, ref):
    return np.abs(np.asarray(img, np.int32) - np.asarray(ref, np.int32)).mean() < TOL


def test_load_gops_merged_and_list(clip, tmp_path):
    path, frames = clip
    dec = GopDecoder()
    files = []
    for i, fid in enumerate([0, 13, 27]):
        packets, _, _ = dec.GetGOP([path], [fid])
        f = str(tmp_path / f"gop_{i}.bin")
        dec.SavePacketsToFile(packets, f)
        files.append(f)

    merged = GopDecoder.LoadGops(files)
    assert isinstance(merged, np.ndarray)
    out = dec.DecodeFromGOPRGB(merged, [path] * 3, [0, 13, 27])
    for img, fid in zip(out, [0, 13, 27]):
        assert close(img, frames[fid])

    lst = GopDecoder.LoadGopsToList(files)
    assert isinstance(lst, list) and len(lst) == 3
    for b, fid in zip(lst, [0, 13, 27]):
        (img,) = dec.DecodeFromGOPRGB(b, [path], [fid])
        assert close(img, frames[fid])


def test_extract_packet_list_metadata(clip):
    path, _ = clip
    dec = GopDecoder()
    packets, _, _ = dec.GetGOP([path], [5])
    (meta,) = dec.ExtractPacketList(packets)
    assert meta["width"] == 96 and meta["height"] == 64
    assert meta["num_frames"] >= 1 and len(meta["packets"]) >= meta["num_frames"]
    assert len(meta["pts"]) == len(meta["packets"]) == len(meta["display_rel"])
    # first packet of a GOP is the keyframe
    assert meta["flags"][0] & 1
    info = dec.ParseSerializedPacketBundle(packets)[0]
    assert info["codec_id"] == meta["codec_id"]


@pytest.mark.parametrize("fixture", ["clip", "bclip"])
def test_packet_list_roundtrip_bit_identical(fixture, request):
    """Extract -> reassemble -> decode must match the direct bundle decode
    bit for bit (incl. B-frame content via the metadata path)."""
    path, frames = request.getfixturevalue(fixture)
    dec = GopDecoder()
    fids = [3, 17, 30]
    for fid in fids:
        packets, firsts, _ = dec.GetGOP([path], [fid])
        (direct,) = dec.DecodeFromGOPRGB(packets, [path], [fid])
        (meta,) = dec.ExtractPacketList(packets)
        dec.DecodeFromPacketListInitialize([meta["codec_id"]])
        (redone,) = dec.DecodeFromPacketListRGB(
            [meta["packets"]],
            [list(range(len(meta["packets"])))],
            [meta["width"]],
            [meta["height"]],
            [fid],
            metadatas=[meta],
        )
        np.testing.assert_array_equal(redone, direct)
        assert close(redone, frames[fid])


def test_packet_list_initialize_validation():
    dec = GopDecoder()
    with pytest.raises(RuntimeError, match="codec_ids cannot be empty"):
        dec.DecodeFromPacketListInitialize([])
    with pytest.raises(RuntimeError, match="Initialize"):
        GopDecoder().DecodeFromPacketListRGB([[np.zeros(4, np.uint8)]], [[0]], [8], [8], [0])


def test_packet_list_length_validation(clip):
    path, _ = clip
    dec = GopDecoder()
    packets, _, _ = dec.GetGOP([path], [0])
    (meta,) = dec.ExtractPacketList(packets)
    dec.DecodeFromPacketListInitialize([meta["codec_id"]])
    with pytest.raises(RuntimeError, match="same length"):
        dec.DecodeFromPacketListRGB(
            [meta["packets"]], [[0]], [meta["width"]], [], [0]
        )


def test_packet_list_foreign_packets_without_metadata(clip):
    """The no-metadata path (decode order == display order, extradata given
    explicitly) — the 'packets from another demuxer' scenario.

    Decodes SEVERAL rel values, each against its own reference frame, and
    requires at least one rel > 0: the metadata-free fallback once assigned a
    shared sentinel pts to every packet, collapsing the engine's
    pts->display_rel map so only rel 0 decoded — a rel-0-only test was green
    through that bug."""
    path, frames = clip
    dec = GopDecoder()
    tested_rels = []
    for target in (2, 5, 9):
        packets, (first,), _ = dec.GetGOP([path], [target])
        (meta,) = dec.ExtractPacketList(packets)
        # keep only packets up to the target's display index (closed GOP, no
        # B-frames -> decode order == display order)
        rel = target - first
        tested_rels.append(rel)
        sel = list(range(rel + 1))
        dec.DecodeFromPacketListInitialize([meta["codec_id"]])
        (img,) = dec.DecodeFromPacketListRGB(
            [[meta["packets"][j] for j in sel]],
            [list(range(len(sel)))],
            [meta["width"]],
            [meta["height"]],
            [rel],  # relative id in the no-metadata contract
            extradatas=[meta["extradata"]],
        )
        assert close(img, frames[target]), f"target {target} (rel {rel})"
        # strict best-match: the decoded frame must be closer to ITS
        # reference frame than to any other (catches off-by-one/collapsed
        # mappings that still pass a loose tolerance)
        dists = [
            np.abs(np.asarray(img, np.int32) - np.asarray(f, np.int32)).mean()
            for f in frames[: first + len(sel) + 2]
        ]
        assert int(np.argmin(dists)) == target, f"best match {np.argmin(dists)} != {target}"
    assert max(tested_rels) > 0, "fixture regression: every target was a keyframe"
