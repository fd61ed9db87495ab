"""Data-echoing throughput at the headline bench config.

Measures delivered (batch, augmented) throughput for echo_factor in
{1, 2, 4} on the same 6-camera 1024x372 -> 256x704 pipeline as ``bench.py``
(same wire selection: ``ACCVLAB_BENCH_WIRE``, default the DCT coefficient
wire). On the wire-bound tunnel setup each replay skips host decode AND the
host->device transfer, so delivered frames/s should scale ~linearly with
the factor until device compute (the fused augment program) becomes the
gate.

Usage: python scripts/bench_echo.py [--factors 1,2,4] [--batches 12]
Prints one JSON line per factor; appends nothing (copy results into
docs/performance.md).
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,4")
    ap.add_argument("--batches", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    drain = jax.jit(lambda x: jnp.sum(jnp.asarray(x, jnp.float32)))

    batch_size, num_cams = 8, 6
    for factor in [int(f) for f in args.factors.split(",")]:
        pipe = bench.build_pipeline(batch_size=batch_size, echo_factor=factor)
        try:
            t0 = time.time()
            out = pipe.run()
            float(drain(list(out.values())[0]))  # true sync (compile)
            print(
                f"echo={factor}: first batch (compile) {time.time() - t0:.1f}s",
                file=sys.stderr, flush=True,
            )
            for _ in range(2 * factor):  # warm the ring in delivered units
                pipe.run()
            n = args.batches * factor  # same host-batch count per factor
            best = None
            for _ in range(3):
                t1 = time.perf_counter()
                for _ in range(n):
                    out = pipe.run()
                float(drain(list(out.values())[0]))
                dt = time.perf_counter() - t1
                best = dt if best is None else min(best, dt)
            frames = n * batch_size * num_cams
            # actual bytes of one host->device transfer (reflects the
            # configured wire: DCT / packed-YUV / raw — a hardcoded
            # 1.5 B/px YUV estimate would overstate the DCT wire ~2.5x)
            upload_mb = pipe.stats()["bytes_per_batch"] / 1e6
            host_batches = n / factor
            # throughput row FIRST: the idle measurement below compiles a
            # train step through the tunnel (60-400 s episodes) and the
            # watcher's timeout must not take the measured row down with it
            print(
                json.dumps(
                    {
                        "echo_factor": factor,
                        "delivered_fps": round(frames / best, 1),
                        "fresh_fps": round(frames / best / factor, 1),
                        "effective_wire_MBps": round(
                            host_batches * upload_mb / best, 1
                        ),
                        "batches": n,
                    }
                ),
                flush=True,
            )
            # input-attributable idle of a realistic train step fed by THIS
            # echoed pipeline (BASELINE north star: does idle collapse as
            # echoing amortizes the wire?). The train-step program is shared
            # process-globally, so only the first factor pays its compile.
            try:
                idle = bench.measure_input_idle(pipe, num_cams, n_iters=4)
                print(
                    json.dumps(
                        {"echo_factor": factor, "input_idle_frac": round(idle, 3)}
                    ),
                    flush=True,
                )
            except Exception as e:  # measurement is best-effort
                print("idle measurement failed:", repr(e), file=sys.stderr,
                      flush=True)
        finally:
            pipe.stop()


if __name__ == "__main__":
    main()
