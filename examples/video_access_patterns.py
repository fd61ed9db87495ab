"""Every video access pattern in one runnable tour.

Consolidates the reference's ``samples/`` directory
(``SampleRandomAccess``, ``SampleRandomAccessWithFastInit``,
``SampleStreamAccess``, ``SampleStreamAsyncAccess``,
``SampleBatchAsyncStreamAccess``, ``SampleDecodeFromGopFiles`` (+ToListAPI),
``SampleDecodeFromGopList``, ``SampleSeparationAccess`` (+GOPListAPI),
``SampleSharedGopStore``) into one script against a synthetic clip.

Run: ``python examples/video_access_patterns.py``
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accvlab_tpu.video import (
    CreateBatchAsyncStreamReader,
    CreateGopDecoder,
    CreateSampleReader,
    GetFastInitInfo,
    GopDecoder,
    SharedGopStore,
    write_video,
)
from accvlab_tpu.video.encode import make_moving_shape_frames
from accvlab_tpu.video.readers import FixedSizeReaderMap


def check(tag, img, ref):
    err = np.abs(np.asarray(img, np.int32) - np.asarray(ref, np.int32)).mean()
    status = "ok" if err < 24 else f"MISMATCH ({err:.1f})"
    print(f"  {tag:<42s} {status}")
    assert err < 24, tag


def main():
    tmp = tempfile.mkdtemp()
    frames = make_moving_shape_frames(60, hw=(96, 128), seed=7)
    path = os.path.join(tmp, "clip.mp4")
    write_video(path, frames, fps=12, gop_size=15)

    # 1. Random access (SampleRandomAccess): GOP fetch + decode per frame
    dec = CreateGopDecoder(maxfiles=4, gopCacheCapacity=4)
    packets, firsts, lens = dec.GetGOP([path], [23])
    (img,) = dec.DecodeFromGOPRGB(packets, [path], [23])
    check("random access (GetGOP + DecodeFromGOPRGB)", img, frames[23])

    # 2. Random access with fast init (SampleRandomAccessWithFastInit)
    infos = GetFastInitInfo([path])
    packets, _, _ = dec.GetGOP([path], [37], fastStreamInfos=infos)
    (img,) = dec.DecodeFromGOPRGB(packets, [path], [37])
    check("fast-init random access", img, frames[37])

    # 3. Stream access (SampleStreamAccess): sequential forward decode
    readers = FixedSizeReaderMap(2)
    r = readers.get(path)
    for fid in (0, 1, 2, 3):
        check(f"stream access frame {fid}", r.read(fid), frames[fid])
    readers.release()

    # 4. Async stream access (SampleStreamAsyncAccess): double buffering
    sr = CreateSampleReader(max_readers=2)
    sr.DecodeAsync([path], [10])
    (img,) = sr.GetBuffer([path], [10])
    check("async stream (DecodeAsync/GetBuffer)", img, frames[10])

    # 5. Batch async 2-D decode (SampleBatchAsyncStreamAccess)
    br = CreateBatchAsyncStreamReader(max_readers=2)
    br.Decode([path], [[5, 20, 35]])
    out = br.GetBuffer([path], [[5, 20, 35]])
    for img, fid in zip(out[0], (5, 20, 35)):
        check(f"batch async frame {fid}", img, frames[fid])

    # 6. Persistence: save GOPs, decode later with no demuxer
    #    (SampleDecodeFromGopFiles / ...ToListAPI / SampleDecodeFromGopList)
    gop_files = []
    for i, fid in enumerate((8, 44)):
        packets, _, _ = dec.GetGOP([path], [fid])
        f = os.path.join(tmp, f"gop{i}.bin")
        GopDecoder.SavePacketsToFile(packets, f)
        gop_files.append(f)
    merged, firsts, lens = GopDecoder.LoadGOPFromFiles(gop_files)
    out = dec.DecodeFromGOPRGB(merged, [path, path], [8, 44])
    check("demuxer-free decode (LoadGOPFromFiles)", out[0], frames[8])
    for b, fid in zip(GopDecoder.LoadGopsToList(gop_files), (8, 44)):
        (img,) = dec.DecodeFromGOPRGB(b, [path], [fid])
        check(f"demuxer-free list API frame {fid}", img, frames[fid])

    # 7. Separation access (SampleSeparationAccess): raw packet custody
    packets, _, _ = dec.GetGOP([path], [50])
    (meta,) = GopDecoder.ExtractPacketList(packets)
    dec.DecodeFromPacketListInitialize([meta["codec_id"]])
    (img,) = dec.DecodeFromPacketListRGB(
        [meta["packets"]],
        [list(range(len(meta["packets"])))],
        [meta["width"]],
        [meta["height"]],
        [50],
        metadatas=[meta],
    )
    check("separation access (packet-list decode)", img, frames[50])

    # 8. Shared GOP store (SampleSharedGopStore): cross-process GOP cache
    store = SharedGopStore.create(capacity=4, store_id=os.getpid() % 1000)
    try:
        packets, (first,), (length,) = dec.GetGOP([path], [30])
        store.put(path, first, length, np.asarray(packets))
        ref = store.lookup(path, 30)
        assert ref is not None
        (img,) = dec.DecodeFromGOPRGB(store.read(ref), [path], [30])
        check("shared GOP store roundtrip", img, frames[30])
    finally:
        store.cleanup()

    # 9. YUV 4:2:0 wire decode (the NVDEC color-convert split): the host
    # ships planar Y + half-res CbCr (1.5 B/px) and RGB happens on device
    # with the frame's reported matrix/range (here converted on host only to
    # validate against the source)
    (yf,) = dec.DecodeYUV([path], [40])
    assert yf.y.shape == frames[40].shape[:2]
    assert yf.cbcr.shape == (frames[40].shape[0] // 2, frames[40].shape[1] // 2, 2)
    check(f"yuv wire decode ({yf.matrix}/{yf.color_range})", yf.to_rgb(), frames[40])

    # 10. Fused decode+resize on the YUV wire: frames land at the model's
    # input size (even dims) straight out of the decode pass — wire bytes
    # drop by the area ratio BEFORE the host->device transfer (the video
    # analog of ImageDecoder(decode_resize_hw=...))
    (hf,) = dec.DecodeYUV([path], [40], out_hw=(48, 64))
    assert hf.y.shape == (48, 64) and hf.cbcr.shape == (24, 32, 2)
    src_half = frames[40].reshape(48, 2, 64, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    check("fused decode+resize yuv (quarter bytes)", hf.to_rgb(), src_half)

    print("all access patterns ok")


if __name__ == "__main__":
    main()
