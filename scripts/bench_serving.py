"""Serving-path benchmark: batched dispatch amortization + server latency.

Measures the two things that decide production serving throughput on one
chip:

1. **Dispatch amortization** — the per-batch cost of the compiled forward
   (CenterNet + NMS-free decode, the detection_serving program) at each
   bucket size: images/s at batch 1 vs 2 vs 4 vs 8. The batch-1 to batch-8
   ratio is the win micro-batching buys (per-dispatch overhead + better MXU
   utilization).
2. **InferenceServer end-to-end** — concurrent client threads submitting
   single samples through the micro-batching server; reports delivered
   requests/s, the realized bucket histogram, and queue-wait/exec latency
   percentiles from ``server.stats()``.

Wedge-safe: probes the tunnel in a killable subprocess first and exits 3
without touching the backend if it is wedged (NEVER call jax.devices() in
a process you can't kill — NEXT_STEPS.md). CPU smoke run:
``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/bench_serving.py
--hw 64 96 --iters 5``.

Prints one JSON line on stdout; diagnostics on stderr.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


from bench_probe import probe_tpu_or_exit  # noqa: E402 — shared wedge guard


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--buckets", type=int, nargs="+", default=(1, 2, 4, 8))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--per-client", type=int, default=25)
    ap.add_argument("--max-delay-ms", type=float, default=3.0)
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="in-flight dispatch window (2 overlaps host "
                         "batching with device execution)")
    ap.add_argument("--quantize", choices=("none", "int8", "int4"),
                    default="none",
                    help="serve quantized weights (dequant fused in-graph; "
                         "the HBM-stream win is a TPU property)")
    args = ap.parse_args()

    probe_tpu_or_exit()

    import jax

    from accvlab_tpu.models import InferenceServer
    from accvlab_tpu.models.centernet import CenterNetDetector, decode_detections

    hw = tuple(args.hw)
    model = CenterNetDetector(num_classes=args.classes, width=64)
    rng = np.random.default_rng(0)
    max_b = max(args.buckets)
    images = rng.uniform(0, 1, (max_b, *hw, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1])

    if args.quantize != "none":
        from accvlab_tpu.models.quantize import (
            freeze_params_quantized,
            params_nbytes,
            quantize_params,
        )

        full_bytes = params_nbytes(params)
        params = quantize_params(
            params,
            bits=8 if args.quantize == "int8" else 4,
            group_size=None if args.quantize == "int8" else 64,
        )
        log(
            f"quantize={args.quantize}: params {full_bytes / 1e6:.2f} -> "
            f"{params_nbytes(params) / 1e6:.2f} MB"
        )
        apply_fn = freeze_params_quantized(model.apply, params)
    else:
        apply_fn = lambda imgs: model.apply(params, imgs)

    @jax.jit
    def serve_fn(imgs):
        return decode_detections(apply_fn(imgs), max_detections=100)

    backend = jax.default_backend()
    log(f"backend={backend}, hw={hw}, buckets={tuple(args.buckets)}")

    # ---- 1. dispatch amortization per bucket size ---------------------- #
    per_bucket = {}
    for b in sorted(args.buckets):
        batch = images[:b]
        out = jax.block_until_ready(serve_fn(batch))  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = serve_fn(batch)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        per_bucket[b] = {"ms_per_batch": round(ms, 3),
                         "img_per_s": round(b / ms * 1e3, 1)}
        log(f"bucket {b}: {ms:.2f} ms/batch = {b / ms * 1e3:.0f} img/s")
    amortization = (
        per_bucket[max_b]["img_per_s"] / per_bucket[min(args.buckets)]["img_per_s"]
    )

    # ---- 2. InferenceServer under concurrent clients ------------------- #
    server = InferenceServer(
        serve_fn, batch_sizes=tuple(args.buckets),
        max_delay_ms=args.max_delay_ms, pipeline_depth=args.pipeline_depth,
    )
    server.warmup(images[0])
    n = args.clients * args.per_client
    req_lat = [[] for _ in range(args.clients)]  # client-observed latencies

    def client(cid):
        for i in range(args.per_client):
            t = time.perf_counter()
            server.infer(images[(cid + i) % max_b])
            req_lat[cid].append(time.perf_counter() - t)

    threads = [threading.Thread(target=client, args=(c,)) for c in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    st = server.stats()
    server.close()
    served_rps = n / wall
    lat = np.asarray([x for per in req_lat for x in per]) * 1e3  # ms
    log(
        f"server: {n} requests in {wall:.2f}s = {served_rps:.1f} req/s; "
        f"buckets {st['batch_size_counts']}, padded {st['padded_samples']}, "
        f"request p50/p95 {np.percentile(lat, 50):.1f}/"
        f"{np.percentile(lat, 95):.1f} ms (client-observed), "
        f"wait p95 {st['queue_wait'].get('p95_ms', 0):.1f} ms"
    )

    print(json.dumps({
        "metric": "serving_requests_per_s",
        "value": round(served_rps, 1),
        "unit": "req/s",
        "pipeline_depth": args.pipeline_depth,
        "quantize": args.quantize,
        "backend": backend,
        "hw": list(hw),
        "per_bucket": per_bucket,
        "batch_amortization_x": round(amortization, 2),
        "server_bucket_hist": {str(k): v for k, v in st["batch_size_counts"].items()},
        "server_padded": st["padded_samples"],
        # client-observed request latency (submit -> result); stats()'s
        # 'exec' is pipeline residence time at depth > 1, not latency
        "request_p50_ms": round(float(np.percentile(lat, 50)), 2),
        "request_p95_ms": round(float(np.percentile(lat, 95)), 2),
        "queue_wait_p95_ms": round(st["queue_wait"].get("p95_ms", 0.0), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
