"""Resident bench: compile ONCE, convert EVERY window after that.

The per-process conversion model (heal-watcher -> fresh bench.py per entry)
re-pays the 200-700 s remote compile on every attempt because axon never
serializes remote executables — and 2026-08-20 afternoon weather produced
~10-minute windows that fit a compile OR a measurement, rarely both
(13 consecutive yuvpacked attempts lost the race). This process instead
stays alive: it pays the compile once — however long the service takes,
riding through flaps — and afterwards a measurement costs ~30 s, so every
subsequent window yields a fresh datapoint.

Serialization: refreshes the repo's ``.bench_active`` sentinel from a
daemon thread so the heal-watcher yields for as long as this process lives
(the 15-minute mtime expiry never triggers); on exit the sentinel is
removed and the watcher resumes by itself.

Usage:
    python scripts/bench_resident.py --wire yuv            # yuvpacked arm
    python scripts/bench_resident.py --wire yuv --pack 0   # raw arm
    python scripts/bench_resident.py --wire dct            # headline hunt
    ... [--rounds 3] [--gap-s 180] [--out docs/heal_r05/resident_<cfg>.jsonl]

Appends ONE JSON line per measurement round to --out (and stderr progress);
exits 0 after --rounds rounds. A wedge mid-round simply makes that round
slow — the next round re-measures; read the series with its per-round
numbers. Kill by pid for shutdown (never by pattern).
"""

import argparse
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "jax"
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

_SENTINEL = os.path.join(_REPO, ".bench_active")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _hold_sentinel():
    def refresh():
        while True:
            try:
                with open(_SENTINEL, "w") as f:
                    f.write(f"resident:{os.getpid()}")
            except OSError:
                pass
            time.sleep(60)

    threading.Thread(target=refresh, daemon=True).start()
    import atexit

    atexit.register(lambda: os.path.exists(_SENTINEL) and os.remove(_SENTINEL))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wire", default="yuv", choices=["yuv", "dct"])
    ap.add_argument("--pack", default="1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--gap-s", type=float, default=180.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    grouping = os.environ.get("ACCVLAB_BENCH_DCT_GROUPING", "dp16")
    cfg = (
        f"dct-{grouping}"
        if args.wire == "dct"
        else ("yuv-packed" if args.pack != "0" else "raw-yuv")
    )
    out_path = args.out or os.path.join(
        _REPO, "docs", "heal_r05", f"resident_{cfg}.jsonl"
    )
    os.environ["ACCVLAB_BENCH_WIRE"] = args.wire
    os.environ["ACCVLAB_BENCH_WIRE_PACK"] = args.pack

    _hold_sentinel()

    import bench

    batch_size, num_cams, n_batches = 8, 6, 12
    pipe = bench.build_pipeline(batch_size=batch_size)

    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices(), "| config:", cfg)
    drain = jax.jit(lambda x: jnp.sum(jnp.asarray(x, jnp.float32)))

    def sync(out):
        float(drain(list(out.values())[0]))

    t0 = time.time()
    sync(pipe.run())  # THE compile — unbounded, rides through flaps
    compile_s = time.time() - t0
    log(f"compile + first batch: {compile_s:.1f}s (resident: paid once)")

    baseline_fps = 48 / 0.868
    for rnd in range(1, args.rounds + 1):
        sync(pipe.run())  # re-warm after the gap (prefetch ring state)
        lat = []
        t_start = time.perf_counter()
        for _ in range(n_batches):
            t1 = time.perf_counter()
            out = pipe.run()
            lat.append(time.perf_counter() - t1)
        sync(out)  # drain: all device work inside the window
        total = time.perf_counter() - t_start
        up_mb = pipe.stats()["bytes_per_batch"] / 1e6
        fps = n_batches * batch_size * num_cams / total
        wire = up_mb / (total / n_batches)
        rec = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "config": cfg,
            "round": rnd,
            "value_fps": round(fps, 1),
            "vs_baseline": round(fps / baseline_fps, 2),
            "upload_MB_per_batch": round(up_mb, 1),
            "effective_wire_MBps": round(wire, 1),
            "fps_per_wire_MBps": round(fps / wire, 2),
            "p50_batch_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "resident": True,
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        log("round", rnd, json.dumps(rec))
        if rnd < args.rounds:
            time.sleep(args.gap_s)
    pipe.stop()


if __name__ == "__main__":
    main()
