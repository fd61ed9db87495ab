"""Device-side cost of the DCT wire's decode half, measured in isolation.

The open question from the round-4 watch log (NEXT_STEPS.md): if a healthy
tunnel window shows the DCT wire's ``fps_per_wire_MBps`` BELOW the
byte-ratio projection (~9 for dp16 vs 3.70 raw), the device half — bit
unpack -> exception patch -> dequantize -> scaled IDCT (einsum) -> resize —
is eating the wire saving. This script answers that directly: it packs one
representative headline batch on the host, transfers it ONCE, then times
the jitted batched decode program alone (no pipeline, no wire), reporting
the device decode budget in ms/batch and the frames/s ceiling it implies.

Wedge-safe: probes the tunnel in a killable subprocess first and exits 3
without touching the backend if it is wedged (NEVER call jax.devices() in
a process you can't kill — NEXT_STEPS.md).

Usage: python scripts/bench_dct_device.py [--grouping split12|band|diag8|dpN]
                                          [--iters 20]
Prints one JSON line on stdout; diagnostics on stderr. Run it on CPU for a
smoke check with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.
"""

import argparse
import io
import json
import os

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "jax"
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

SRC_HW = (372, 1024)
OUT_HW = (256, 704)
BATCH, CAMS = 8, 6  # the headline config: 48 frames/batch


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_jpegs(n):
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        base = rng.integers(0, 255, (SRC_HW[0] // 8, SRC_HW[1] // 8, 3), np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((SRC_HW[1], SRC_HW[0]), Image.BILINEAR),
            np.uint8,
        )
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        out.append(np.frombuffer(buf.getvalue(), np.uint8).copy())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grouping", default="dp16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_probe import probe_tpu_or_exit  # shared wedge guard

    probe_tpu_or_exit()

    from accvlab_tpu.pipeline.processing_steps import DCTWirePacker, DCTWireUnpacker
    from accvlab_tpu.pipeline.processing_steps.dct_wire import (
        _field_names,
        optimize_band_groups,
    )
    from accvlab_tpu.pipeline import DType, SampleDataGroup

    # On-chip bit-exactness of the merged raw-byte transport (the pipeline's
    # default H2D plan since round 5): device-side lax.bitcast_convert_type
    # re-typing is asserted byte-identical on XLA:CPU (tests/test_hostcopy),
    # but TPU lowering is a different backend — prove it on the chip before
    # trusting the headline numbers that rode it. Mixed dtypes, odd sizes
    # (alignment tails), an empty field, and a >256 KB field (pack-candidate
    # override path) — the cases the plan treats differently.
    from accvlab_tpu.hostcopy import start_copy

    rng = np.random.default_rng(7)
    tree = {
        "u8": rng.integers(0, 256, (37, 13), np.uint8),
        "i16": rng.integers(-(2**15), 2**15, (129,), np.int64).astype(np.int16),
        "i32": rng.integers(-(2**31), 2**31 - 1, (7, 3, 5), np.int64).astype(np.int32),
        "f32": rng.standard_normal((1025,)).astype(np.float32),
        "empty": np.zeros((0, 4), np.int32),
        "big_f32": rng.standard_normal((300_000,)).astype(np.float32),  # >1 MB
    }
    got = start_copy(
        tree, use_background_thread=False,
        pack_candidate_max_bytes=32 << 20, merge_dtype_chunks=True,
    ).get()
    mism = [
        k for k in tree
        if not (
            np.asarray(got[k]).dtype == tree[k].dtype
            and np.asarray(got[k]).shape == tree[k].shape
            and np.array_equal(np.asarray(got[k]), tree[k])
        )
    ]
    if mism:
        log(f"TRANSPORT BIT-EXACTNESS FAILED on-device for fields: {mism}")
        print(json.dumps({"metric": "DCT-wire device decode", "transport_bitexact": False,
                          "mismatched_fields": mism}), flush=True)
        sys.exit(5)
    log("merged byte-chunk transport: bit-exact on-device (6-field mixed tree)")

    jpegs = make_jpegs(BATCH * CAMS)
    grouping = args.grouping
    if grouping.startswith("dp"):
        grouping = optimize_band_groups(
            jpegs[:3], SRC_HW, OUT_HW, max_groups=max(2, int(grouping[2:]))
        )
        log(f"DP-tuned grouping: {grouping}")

    packer = DCTWirePacker("image", SRC_HW, OUT_HW, grouping=grouping)
    unpacker = DCTWireUnpacker("image", SRC_HW, OUT_HW, grouping=grouping)
    samples = []
    for jb in jpegs:
        s = SampleDataGroup()
        s.add_data_field("image", DType.UINT8)
        s["image"] = jb
        samples.append(s)
    samples = packer._process_batch(samples)
    names = _field_names("image", packer._groups, packer._geo)
    host_fields = {
        name[len("image_"):]: np.stack([np.asarray(s[name]) for s in samples])
        for name in names
    }
    wire_mb = sum(a.nbytes for a in host_fields.values()) / 1e6
    log(f"wire: {wire_mb:.2f} MB/batch ({BATCH * CAMS} frames)")

    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    dev_fields = jax.device_put(host_fields)
    jax.block_until_ready(jax.tree_util.tree_leaves(dev_fields)[0])

    def decode_one(fields):
        y, cbcr = unpacker.decode_fields(lambda sfx: fields[sfx])
        return y, cbcr

    @jax.jit
    def decode_batch(fields):
        y, cbcr = jax.vmap(decode_one)(fields)
        # scalar egress: a true sync materializes one value, not the planes
        return y, cbcr, jnp.sum(y.astype(jnp.float32)) + jnp.sum(
            cbcr.astype(jnp.float32)
        )

    t0 = time.time()
    _, _, chk = decode_batch(dev_fields)
    float(chk)  # full materialization sync (axon: block_until_ready is early)
    log(f"compile + first run {time.time() - t0:.1f}s")

    # best-of-3 passes of --iters runs, one sync per pass
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y_dev, cbcr_dev, chk = decode_batch(dev_fields)
        float(chk)
        dt = (time.perf_counter() - t0) / args.iters
        best = dt if best is None else min(best, dt)
    frames = BATCH * CAMS

    # On-chip tolerance goldens (the contract of tests/test_dct_wire.py::
    # test_roundtrip_luma_within_2 / _chroma_tolerance, which only ever ran
    # on XLA:CPU before 2026-08-20): pull a few decoded frames back from the
    # device and compare against the host libjpeg pixel path.
    from accvlab_tpu.pipeline import native_jpeg

    n_check = 4
    y_host = np.asarray(y_dev[:n_check])
    cbcr_host = np.asarray(cbcr_dev[:n_check])
    luma_max = 0
    chroma_mean = chroma_p99 = chroma_max = 0.0
    for i in range(n_check):
        ref_y, ref_cbcr = native_jpeg.decode_yuv420(jpegs[i], OUT_HW)
        luma_max = max(
            luma_max, int(np.abs(y_host[i].astype(int) - ref_y.astype(int)).max())
        )
        d = np.abs(cbcr_host[i].astype(int) - ref_cbcr.astype(int))
        chroma_mean = max(chroma_mean, float(d.mean()))
        chroma_p99 = max(chroma_p99, float(np.percentile(d, 99)))
        chroma_max = max(chroma_max, float(d.max()))
    goldens_ok = (
        luma_max <= 2 and chroma_mean <= 6 and chroma_p99 <= 24 and chroma_max <= 48
    )
    log(
        f"on-chip goldens vs libjpeg pixel path ({n_check} frames): luma max "
        f"diff {luma_max}, chroma mean {chroma_mean:.2f} / p99 {chroma_p99:.0f} "
        f"/ max {chroma_max:.0f} -> {'OK' if goldens_ok else 'FAIL'}"
    )
    print(
        json.dumps(
            {
                "metric": "DCT-wire device decode (unpack+IDCT+resize)",
                "ms_per_batch": round(best * 1e3, 2),
                "frames_per_batch": frames,
                "device_fps_ceiling": round(frames / best, 1),
                "wire_MB_per_batch": round(wire_mb, 2),
                "grouping": str(args.grouping),
                "goldens_ok": goldens_ok,
                "luma_max_diff": luma_max,
                "chroma_mean_diff": round(chroma_mean, 2),
                "transport_bitexact": True,
            }
        ),
        flush=True,
    )
    sys.exit(0 if goldens_ok else 4)


if __name__ == "__main__":
    main()
