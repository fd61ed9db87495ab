"""Multi-GB video soak: long-clip sequential + random access + cache churn.

Decodes several GB of pixel data through the engine while tracking peak RSS
— catches leaks of frames/packets/decoder contexts that CI-scale tests
can't see (model: the reference's large stress suites,
``test_stream_resource_free.py``).

Run: ``python -u scripts/soak_video.py [n_frames] [WxH]`` (defaults
3600 / 640x480 -> ~3.3 GB decoded across the passes). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from accvlab_tpu.video import CreateGopDecoder, GopDecoder, write_video
from accvlab_tpu.video.readers import _StreamReader

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3600
W, H = (
    [int(x) for x in sys.argv[2].split("x")] if len(sys.argv) > 2 else (640, 480)
)
GOP = 30


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    tmp = "/tmp/accvlab_soak"
    os.makedirs(tmp, exist_ok=True)
    path = os.path.join(tmp, f"soak_{N}_{W}x{H}.mp4")
    t0 = time.time()
    if not os.path.exists(path):
        # synthesize in slabs to keep encode-side RSS flat
        print(f"encoding {N} frames {W}x{H} ...", file=sys.stderr, flush=True)
        rng = np.random.default_rng(0)
        slab = 240
        parts = []
        base = rng.integers(0, 255, (H // 8, W // 8, 3), np.uint8)
        from PIL import Image

        bg = np.asarray(Image.fromarray(base).resize((W, H), Image.BILINEAR))
        frames = np.empty((slab, H, W, 3), np.uint8)
        import tempfile

        # encode slab-wise into one file is not supported by write_video;
        # build the full array memmapped instead
        mm = np.lib.format.open_memmap(
            os.path.join(tmp, "frames.npy"), mode="w+", dtype=np.uint8,
            shape=(N, H, W, 3),
        )
        for i in range(N):
            f = bg.copy()
            x = (i * 7) % (W - 60)
            y = (i * 5) % (H - 60)
            f[y : y + 60, x : x + 60] = (i * 37 % 255, 255 - i % 255, i % 255)
            mm[i] = f
        write_video(path, np.asarray(mm), fps=24, gop_size=GOP)
        del mm
        os.remove(os.path.join(tmp, "frames.npy"))
    enc_s = time.time() - t0
    size_mb = os.path.getsize(path) / 1e6
    frame_mb = W * H * 3 / 1e6
    decoded_mb = 0.0
    rss_after_encode = rss_mb()

    # 1. full sequential pass (stream reader, decoder-state continuity)
    t1 = time.time()
    r = _StreamReader(path)
    try:
        assert r.num_frames == N, (r.num_frames, N)
        for fid in range(N):
            img = r.read(fid)
            decoded_mb += frame_mb
            if fid % 600 == 0:
                print(
                    f"seq {fid}/{N} rss {rss_mb():.0f} MB", file=sys.stderr, flush=True
                )
    finally:
        r.close()
    seq_s = time.time() - t1
    rss_after_seq = rss_mb()

    # 2. deep random access through the GOP cache (hits + misses + LRU churn)
    t2 = time.time()
    dec = CreateGopDecoder(gopCacheCapacity=8)
    rng = np.random.default_rng(1)
    hits = 0
    n_rand = 400
    for k in range(n_rand):
        fid = int(rng.integers(0, N))
        packets, _, _ = dec.GetGOP([path], [fid], useGOPCache=True)
        (img,) = dec.DecodeFromGOPRGB(packets, [path], [fid])
        decoded_mb += frame_mb
        hits += int(dec.isCacheHit()[0])
    rand_s = time.time() - t2
    rss_after_rand = rss_mb()

    # 3. YUV-wire pass (half-byte path exercised at scale too)
    t3 = time.time()
    dec2 = GopDecoder()
    for fid in range(0, N, 9):
        (yf,) = dec2.DecodeYUV([path], [fid])
        decoded_mb += frame_mb / 2
    yuv_s = time.time() - t3

    print(
        json.dumps(
            {
                "n_frames": N,
                "res": f"{W}x{H}",
                "file_MB": round(size_mb, 1),
                "decoded_GB": round(decoded_mb / 1e3, 2),
                "encode_s": round(enc_s, 1),
                "seq_pass_s": round(seq_s, 1),
                "seq_fps": round(N / seq_s, 1),
                "random_access_s": round(rand_s, 1),
                "random_per_frame_ms": round(rand_s / n_rand * 1e3, 1),
                "cache_hit_frac": round(hits / n_rand, 2),
                "yuv_pass_s": round(yuv_s, 1),
                "peak_rss_MB": round(rss_mb(), 1),
                "rss_after_encode_MB": round(rss_after_encode, 1),
                "rss_after_seq_MB": round(rss_after_seq, 1),
                "rss_after_random_MB": round(rss_after_rand, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
