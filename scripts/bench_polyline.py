"""Batched polyline interpolation benchmark over the reference's grid.

Mirrors ``lane_helpers/evaluation/shapely_evaluation.py`` (reference docs
``introduction.rst:40-115``): ms per interpolation call over a grid of
(num points, num distances, batch size), against two host baselines:

* ``scalar``  — the per-(line, distance) walk, i.e. the Shapely
  LineString.interpolate call pattern the reference benchmarks against
  (pure-python here; real Shapely's C core is faster per call but keeps
  the per-call Python loop, so this is directional, as the reference
  itself labels its plots).
* ``numpy``   — a vectorized float64 cumsum+searchsorted+lerp restatement
  (the strongest host baseline; speedups against it are conservative).

The TPU path is the library's jitted ``interpolate`` measured with the
established tunnel-proof instrument (K serialized in-jit calls whose
distances derive from the previous output — nothing hoistable/foldable —
``(t_K - t_1)/(K-1)``; see scripts/bench_heatmap.py).

Usage: python scripts/bench_polyline.py [--k 64] [--reps 5]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GRID_POINTS = (10, 100, 1000)
GRID_DISTS = (10, 100, 1000)
GRID_BATCH = (1, 64)


def make_case(batch, n_points, n_dists, seed):
    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.uniform(-1, 1, (batch, n_points, 2)), axis=1).astype(
        np.float32
    )
    rel = rng.uniform(0, 1, (batch, n_dists)).astype(np.float32)
    return pts, rel


def scalar_ms(pts, rel, budget_s=2.0):
    """Per-(line, distance) python walk (the Shapely call pattern)."""
    from tests.test_polyline_crossval import geos_interpolate_point

    lines = [list(map(tuple, p.astype(np.float64))) for p in pts]
    seg = np.linalg.norm(np.diff(pts.astype(np.float64), axis=1), axis=2)
    total = seg.sum(axis=1)
    dabs = rel.astype(np.float64) * total[:, None]
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < budget_s:
        for s, line in enumerate(lines):
            for q in range(dabs.shape[1]):
                geos_interpolate_point(line, float(dabs[s, q]))
        n += 1
        if n >= 50:
            break
    return (time.perf_counter() - t0) / n * 1e3


def numpy_ms(pts, rel, budget_s=1.0):
    from tests.test_polyline_crossval import vendored_geos_interpolate

    seg = np.linalg.norm(np.diff(pts.astype(np.float64), axis=1), axis=2)
    dabs = rel.astype(np.float64) * seg.sum(axis=1)[:, None]
    vendored_geos_interpolate(pts, dabs)  # warm
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < budget_s:
        vendored_geos_interpolate(pts, dabs)
        n += 1
        if n >= 200:
            break
    return (time.perf_counter() - t0) / n * 1e3


def tpu_ms(pts, rel, k, reps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from accvlab_tpu.polyline import interpolate

    pts_j = jnp.asarray(pts)
    rel_j = jnp.asarray(rel)

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(p, r0, iters):
        def body(carry, i):
            # distances derive from the previous output: iterations
            # serialize and the interpolation cannot hoist or fold
            r = jnp.clip(r0 + carry * jnp.float32(1e-6), 0.0, 1.0)
            out = interpolate(p, r, relative=True)
            return jnp.mean(out), None

        final, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32))
        return final

    def call(iters):
        return float(run(pts_j, rel_j, iters))

    call(k); call(1)  # compile both
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter(); call(k); t1 = time.perf_counter()
        t2 = time.perf_counter(); call(1); t3 = time.perf_counter()
        samples.append(max(((t1 - t0) - (t3 - t2)) / (k - 1), 0.0))
    return float(np.median(samples) * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for batch in GRID_BATCH:
        for n_points in GRID_POINTS:
            for n_dists in GRID_DISTS:
                pts, rel = make_case(batch, n_points, n_dists, seed=batch * 7 + n_points)
                t_tpu = tpu_ms(pts, rel, args.k, args.reps)
                t_np = numpy_ms(pts, rel)
                # the scalar walk on the largest cells takes minutes; cap it
                work = batch * n_dists
                t_sc = scalar_ms(pts, rel) if work <= 64_000 else None
                rec = {
                    "batch": batch,
                    "points": n_points,
                    "dists": n_dists,
                    "tpu_ms": round(t_tpu, 4),
                    "numpy_ms": round(t_np, 4),
                    "vs_numpy": round(t_np / t_tpu, 1) if t_tpu > 0 else None,
                }
                if t_sc is not None:
                    rec["scalar_ms"] = round(t_sc, 3)
                    rec["vs_scalar"] = round(t_sc / t_tpu, 1) if t_tpu > 0 else None
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
