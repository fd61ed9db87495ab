"""optimize_size_buckets: exact padding/compile trade for ragged sizes.

Oracle: brute-force enumeration of every bucket subset (buckets must end at
segment maxima of the sorted distinct sizes, so enumerating boundary
subsets is exhaustive) — the DP must match its optimum exactly.
"""

import itertools

import numpy as np
import pytest

from accvlab_tpu.pipeline.processing_steps import (
    PaddingToUniform,
    optimize_size_buckets,
)


def _waste(sizes, weights, buckets):
    buckets = sorted(buckets)
    total = 0.0
    for s, w in zip(sizes, weights):
        b = next(x for x in buckets if x >= s)
        total += w * (b - s)
    return total


def _brute(sizes, weights, k):
    vals = sorted(set(sizes))
    best = None
    for r in range(1, min(k, len(vals)) + 1):
        for combo in itertools.combinations(vals, r):
            if combo[-1] != vals[-1]:
                continue  # the largest size must be covered
            best_c = _waste(sizes, weights, combo)
            if best is None or best_c < best:
                best = best_c
    return best


@pytest.mark.parametrize("seed", range(12))
def test_matches_bruteforce_optimum(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(3, 12))
    sizes = rng.integers(1, 40, n).tolist()
    weights = rng.integers(1, 5, n).astype(float).tolist()
    k = int(rng.integers(1, 5))
    got = optimize_size_buckets(sizes, k, weights)
    assert len(got) <= k and got[-1] == max(sizes)
    assert got == sorted(set(got)), "buckets must be distinct ascending"
    np.testing.assert_allclose(
        _waste(sizes, weights, got), _brute(sizes, weights, k)
    )


def test_enough_buckets_means_zero_waste():
    sizes = [3, 7, 7, 11, 20]
    got = optimize_size_buckets(sizes, 10)
    assert got == [3, 7, 11, 20]
    assert _waste(sizes, [1] * len(sizes), got) == 0.0


def test_single_bucket_is_max():
    assert optimize_size_buckets([5, 9, 2], 1) == [9]


def test_weights_shift_the_boundary():
    # many small sequences + one huge: with k=2, weighting the small ones
    # heavily puts a tight bucket at their max
    sizes = [4, 4, 4, 5, 100]
    got = optimize_size_buckets(sizes, 2, weights=[10, 10, 10, 10, 1])
    assert got == [5, 100]


def test_errors():
    with pytest.raises(ValueError):
        optimize_size_buckets([], 2)
    with pytest.raises(ValueError):
        optimize_size_buckets([3], 0)
    with pytest.raises(ValueError):
        optimize_size_buckets([3, 4], 2, weights=[1.0])
    with pytest.raises(ValueError, match="integers"):
        optimize_size_buckets([7.9, 15.6], 2)  # silent truncation would
        # put the max bucket BELOW observed sizes -> compile per shape
    with pytest.raises(ValueError, match="non-negative"):
        optimize_size_buckets([3, -1], 2)


def test_padder_integration_bounds_program_shapes():
    """PaddingToUniform with DP-chosen buckets: across batches with varying
    per-batch maxima, the padded shapes take at most ``max_buckets``
    distinct values and the total padding equals the DP's prediction on
    the batch-max sizes."""
    from accvlab_tpu.pipeline import DType, SampleDataGroup

    rng = np.random.default_rng(0)
    batch_maxes = rng.integers(5, 30, 20).tolist()
    buckets = optimize_size_buckets(batch_maxes, 3)
    # bucket_dims=(0,): only the ragged object axis is bucketed — the fixed
    # coordinate dim stays 2 (without it the buckets would inflate dim 1
    # to the nearest bucket, filling the field with junk columns)
    step = PaddingToUniform("pts", size_buckets=buckets, bucket_dims=(0,))

    seen_shapes = set()
    for m in batch_maxes:
        samples = []
        for ln in (m, max(1, m - 2)):
            s = SampleDataGroup()
            s.add_data_field("pts", DType.FLOAT)
            s["pts"] = np.ones((ln, 2), np.float32)
            samples.append(s)
        out = step._process_batch(samples)
        shapes = {tuple(np.asarray(x["pts"]).shape) for x in out}
        assert len(shapes) == 1  # uniform within the batch
        seen_shapes.add(shapes.pop())
    assert len({sh[0] for sh in seen_shapes}) <= 3
    assert {sh[0] for sh in seen_shapes} <= set(buckets)
    assert {sh[1] for sh in seen_shapes} == {2}  # fixed dim untouched
