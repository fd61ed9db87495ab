"""Hostcopy packed-vs-naive benchmark (reference headline: x8.10 for 528
tensors vs per-tensor ``.to()``, multi_tensor_copier docs).

Measures both regimes from docs/performance.md (dispatch-bound ~4 KB and
bandwidth-bound ~150 KB tensors) with TRUE device sync (value
materialization — on the axon tunnel ``block_until_ready`` resolves before
remote execution completes).

Run standalone: ``python -u scripts/bench_hostcopy.py [n_tensors]``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from accvlab_tpu.hostcopy import start_copy

N = int(sys.argv[1]) if len(sys.argv) > 1 else 528
REPS = 5


def true_sync(tree):
    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "ravel")]
    for leaf in leaves[-1:]:
        float(jnp.ravel(leaf.astype(jnp.float32))[0])


def make_tree(avg_kb, seed):
    rng = np.random.default_rng(seed)
    tree = {}
    for i in range(N):
        n = max(16, int(rng.normal(avg_kb * 1024, avg_kb * 200)) // 4)
        tree[f"t{i}"] = (
            rng.integers(0, 100, n, np.int32)
            if i % 2
            else rng.normal(size=n).astype(np.float32)
        )
    return tree


def measure(avg_kb):
    tree = make_tree(avg_kb, seed=avg_kb)
    total_mb = sum(v.nbytes for v in tree.values()) / 1e6

    def naive():
        out = {k: jax.device_put(v) for k, v in tree.items()}
        true_sync(out)
        return out

    def packed():
        h = start_copy(tree)
        out = h.get()
        true_sync(out)
        return out

    # correctness once
    a, b = naive(), packed()
    for k in tree:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def best(fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_naive, t_packed = best(naive), best(packed)
    return {
        "avg_kb": avg_kb,
        "total_mb": round(total_mb, 1),
        "naive_ms": round(t_naive * 1e3, 1),
        "packed_ms": round(t_packed * 1e3, 1),
        "speedup": round(t_naive / t_packed, 2),
    }


def measure_d2h(avg_kb):
    """Dispatch-bound D2H: many small device arrays back to host, packed
    (on-device concat + one device_get) vs per-array device_get."""
    host_tree = make_tree(avg_kb, seed=1000 + avg_kb)
    tree = {k: jax.device_put(v) for k, v in host_tree.items()}
    true_sync(tree)
    total_mb = sum(v.nbytes for v in host_tree.values()) / 1e6

    def naive():
        return {k: np.asarray(jax.device_get(v)) for k, v in tree.items()}

    def packed():
        return start_copy(tree, device="cpu").get()

    a, b = naive(), packed()
    for k in host_tree:
        np.testing.assert_array_equal(a[k], b[k])

    def best(fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_naive, t_packed = best(naive), best(packed)
    return {
        "direction": "d2h",
        "avg_kb": avg_kb,
        "total_mb": round(total_mb, 1),
        "naive_ms": round(t_naive * 1e3, 1),
        "packed_ms": round(t_packed * 1e3, 1),
        "speedup": round(t_naive / t_packed, 2),
    }


if __name__ == "__main__":
    print("device:", jax.devices()[0], file=sys.stderr)
    for avg_kb in (4, 150):
        print(json.dumps(measure(avg_kb)), flush=True)
    print(json.dumps(measure_d2h(4)), flush=True)
