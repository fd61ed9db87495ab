"""Reproducible draw_heatmap benchmark at the reference headline shapes.

Reference bars (1x A100, CUDA atomic rasterizer,
``draw_heatmap/docs/intro.rst:60-86``): batched 48x20x50 T=50 -> 0.0366 ms;
classwise 48x20x20x50 T=50 -> 0.059 ms.

Methodology (the only one that survives this environment, see
``docs/performance.md``): under the remote-attach tunnel
``jax.block_until_ready`` is a no-op for jit results, and XLA hoists
loop-invariant draws out of in-jit loops — so BOTH target-center
coordinates are DERIVED FROM THE LOOP INDEX and passed as jit ARGUMENTS
(a loop-body input that is a compile-time constant gets constant-folded:
a const-y instrument measured 0.0017-0.0066 ms batched vs 0.010-0.031 ms
with both coords live — the y-half of the draw was folded out of the
loop; this script is the honest, nothing-foldable instrument) and the
heatmap is carried through a ``lax.scan`` with a STATIC trip count
(``fori_loop`` lowers to ``while_loop``, whose per-iteration control
overhead is ~2x the whole body at these sizes). Per-call device time is
``(t_K - t_1) / (K - 1)`` with a value materialization as the true sync.
Median + min of ``--reps`` pairs; the shared pool chip shows 3-6x
intra-session drift on sub-0.1 ms timings, so A/B comparisons must
interleave variants in ONE process and only multi-x differences are
conclusive.

Usage: python scripts/bench_heatmap.py [--exact] [--k 256] [--reps 12]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

A100_MS = {"batched": 0.0366, "classwise": 0.059}


def build_runner(classwise: bool, exact: bool, k_iters: int):
    import jax
    import jax.numpy as jnp

    from accvlab_tpu.heatmap import draw_heatmap_batched
    from accvlab_tpu.ragged import RaggedBatch

    B, C, H, W, T = 48, 20, 20, 50, 50
    rng = np.random.default_rng(0)
    base_x = jnp.asarray(rng.integers(0, W, (B, T)), jnp.int32)
    base_y = jnp.asarray(rng.integers(0, H, (B, T)), jnp.int32)
    radii = RaggedBatch(
        jnp.asarray(rng.integers(1, 5, (B, T)), jnp.int32),
        sample_sizes=jnp.full((B,), T, jnp.int32),
    )
    labels = (
        RaggedBatch(
            jnp.asarray(rng.integers(0, C, (B, T)), jnp.int32),
            sample_sizes=jnp.full((B,), T, jnp.int32),
        )
        if classwise
        else None
    )
    hm0 = jnp.zeros((B, C, H, W) if classwise else (B, H, W), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(bx, by, hm, iters):
        import jax.lax as lax

        def body(carry, i):
            # centers derive from the loop index: the draw is loop-variant
            # (XLA cannot hoist it) and the carry serializes the iterations
            cx = (bx + i) % W
            cy = (by + i) % H
            centers = RaggedBatch(
                jnp.stack([cx, cy], axis=-1),
                sample_sizes=jnp.full((bx.shape[0],), bx.shape[1], jnp.int32),
            )
            out = draw_heatmap_batched(
                carry, centers, radii, labels=labels, exact=exact
            )
            return out, None

        # lax.scan with a STATIC trip count, not fori_loop: fori_loop lowers
        # to while_loop, whose per-iteration dynamic-condition overhead is
        # ~2x the whole body at these sizes (measured same-session: batched
        # 0.0147 ms via fori_loop vs 0.0066 ms via scan)
        final, _ = lax.scan(body, hm, jnp.arange(iters, dtype=jnp.int32))
        # reduce to a scalar so the true-sync materialization moves 4 bytes,
        # not the 3.8 MB heatmap (tunnel-transfer jitter would swamp the
        # per-call signal); the sum depends on the final carry, so every
        # iteration still executes
        return jnp.sum(final)

    def timed_pair():
        # one full dispatch+materialize for K and for 1; difference divides
        # out dispatch, transfer, and the tunnel round trip
        t_k = time.perf_counter()
        np.asarray(run(base_x, base_y, hm0, k_iters))
        t_k = time.perf_counter() - t_k
        t_1 = time.perf_counter()
        np.asarray(run(base_x, base_y, hm0, 1))
        t_1 = time.perf_counter() - t_1
        return max((t_k - t_1) / (k_iters - 1), 0.0)

    # compile both variants (cached afterwards)
    np.asarray(run(base_x, base_y, hm0, k_iters))
    np.asarray(run(base_x, base_y, hm0, 1))
    return timed_pair


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--reps", type=int, default=12)
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for case in ("batched", "classwise"):
        timed_pair = build_runner(case == "classwise", args.exact, args.k)
        samples = [timed_pair() for _ in range(args.reps)]
        ms = float(np.median(samples) * 1e3)
        ms_min = float(np.min(samples) * 1e3)
        print(
            json.dumps(
                {
                    "case": case,
                    "mode": "exact" if args.exact else "fast",
                    "ms_per_call": round(ms, 4),
                    # min-of-reps: the standard noise-floor estimator — the
                    # shared pool chip shows 3-6x intra-session drift on
                    # sub-0.1 ms timings (docs/performance.md)
                    "ms_min": round(ms_min, 4),
                    "a100_ms": A100_MS[case],
                    "vs_a100": round(A100_MS[case] / ms, 2),
                    "k_iters": args.k,
                    "reps": args.reps,
                }
            )
        )


if __name__ == "__main__":
    main()
