"""Randomized cross-checks of the ragged core against pure-numpy oracles.

Mirrors the reference's broad parametrization style (SURVEY §4) with random
shape/size configurations: every op must agree with an obviously-correct
per-sample numpy loop, for every drawn configuration.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from accvlab_tpu.ragged import (
    RaggedBatch,
    average_over_targets,
    batched_bool_indexing,
    batched_indexing_access,
    batched_indexing_write,
    sum_over_targets,
)

CONFIGS = list(range(25))


def draw(rng):
    b = int(rng.integers(1, 5))
    smax = int(rng.integers(1, 7))
    d = int(rng.integers(1, 4))
    sizes = rng.integers(0, smax + 1, (b,)).astype(np.int32)
    if sizes.max() == 0:
        sizes[rng.integers(0, b)] = 1
    smax = int(sizes.max())
    tensor = rng.normal(size=(b, smax, d)).astype(np.float32)
    return b, smax, d, sizes, tensor


@pytest.mark.parametrize("seed", CONFIGS)
def test_gather_matches_numpy_loop(seed):
    rng = np.random.default_rng(seed)
    b, smax, d, sizes, tensor = draw(rng)
    rb = RaggedBatch(jnp.asarray(tensor), sample_sizes=jnp.asarray(sizes))
    idx_sizes = rng.integers(0, smax + 1, (b,)).astype(np.int32)
    idx_sizes = np.minimum(idx_sizes, sizes)
    if idx_sizes.max() == 0:
        idx_sizes[np.argmax(sizes)] = 1
    imax = int(idx_sizes.max())
    idx = np.zeros((b, imax), np.int32)
    for i in range(b):
        if idx_sizes[i] > 0:
            idx[i, : idx_sizes[i]] = rng.integers(0, sizes[i], idx_sizes[i])
    idx_rb = RaggedBatch(jnp.asarray(idx), sample_sizes=jnp.asarray(idx_sizes))

    out = batched_indexing_access(rb, idx_rb)
    arr = np.asarray(out.with_padded_set_to(0.0).tensor)
    for i in range(b):
        for j in range(int(idx_sizes[i])):
            np.testing.assert_allclose(arr[i, j], tensor[i, idx[i, j]], rtol=1e-6)
        assert np.all(arr[i, int(idx_sizes[i]):] == 0.0)


@pytest.mark.parametrize("seed", CONFIGS)
def test_write_matches_numpy_loop(seed):
    rng = np.random.default_rng(100 + seed)
    b, smax, d, sizes, tensor = draw(rng)
    target = RaggedBatch(jnp.asarray(tensor), sample_sizes=jnp.asarray(sizes))
    v_sizes = np.minimum(rng.integers(0, smax + 1, (b,)).astype(np.int32), sizes)
    vmax = max(1, int(v_sizes.max()))
    vals = rng.normal(size=(b, vmax, d)).astype(np.float32)
    idx = np.zeros((b, vmax), np.int32)
    for i in range(b):
        if v_sizes[i] > 0:
            # unique destinations: duplicate-write order is undefined
            idx[i, : v_sizes[i]] = rng.choice(sizes[i], v_sizes[i], replace=False)
    vals_rb = RaggedBatch(jnp.asarray(vals), sample_sizes=jnp.asarray(v_sizes))
    idx_rb = vals_rb.create_with_sample_sizes_like_self(jnp.asarray(idx))

    out = batched_indexing_write(vals_rb, idx_rb, target)
    arr = np.asarray(out.with_padded_set_to(0.0).tensor)
    expect = tensor.copy()
    for i in range(b):
        expect[i, sizes[i]:] = 0.0
        for j in range(int(v_sizes[i])):
            expect[i, idx[i, j]] = vals[i, j]
    np.testing.assert_allclose(arr, expect, rtol=1e-6)


@pytest.mark.parametrize("seed", CONFIGS)
def test_reductions_match_numpy_loop(seed):
    rng = np.random.default_rng(200 + seed)
    b, smax, d, sizes, tensor = draw(rng)
    rb = RaggedBatch(jnp.asarray(tensor), sample_sizes=jnp.asarray(sizes))
    s = np.asarray(sum_over_targets(rb))
    a = np.asarray(average_over_targets(rb))
    for i in range(b):
        n = int(sizes[i])
        np.testing.assert_allclose(s[i], tensor[i, :n].sum(0), rtol=2e-5, atol=1e-6)
        if n > 0:
            np.testing.assert_allclose(a[i], tensor[i, :n].mean(0), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("seed", CONFIGS)
def test_bool_indexing_matches_numpy_loop(seed):
    rng = np.random.default_rng(300 + seed)
    b, smax, d, sizes, tensor = draw(rng)
    rb = RaggedBatch(jnp.asarray(tensor), sample_sizes=jnp.asarray(sizes))
    sel = np.zeros((b, smax), bool)
    for i in range(b):
        sel[i, : sizes[i]] = rng.random(sizes[i]) < 0.5
    sel_rb = rb.create_with_sample_sizes_like_self(jnp.asarray(sel))

    out = batched_bool_indexing(rb, sel_rb)
    out_sizes = np.asarray(out.sample_sizes)
    arr = np.asarray(out.with_padded_set_to(0.0).tensor)
    for i in range(b):
        kept = tensor[i][sel[i]]
        assert out_sizes[i] == kept.shape[0]
        if kept.shape[0]:
            np.testing.assert_allclose(arr[i, : kept.shape[0]], kept, rtol=1e-6)


@pytest.mark.parametrize("seed", CONFIGS[:15])
def test_get_compact_lists_matches_numpy_loop(seed):
    """Compaction of hole-y masks: valid entries move to a prefix, per the
    per-sample numpy oracle ``tensor[i][mask[i]]``."""
    from accvlab_tpu.ragged import get_compact_lists

    rng = np.random.default_rng(400 + seed)
    b, smax, d, sizes, tensor = draw(rng)
    mask = rng.random((b, smax)) < 0.5  # arbitrary holes
    out = get_compact_lists(jnp.asarray(mask), [jnp.asarray(tensor)])[0]
    out_sizes = np.asarray(out.sample_sizes)
    arr = np.asarray(out.with_padded_set_to(0.0).tensor)
    for i in range(b):
        kept = tensor[i][mask[i]]
        assert out_sizes[i] == kept.shape[0]
        if kept.shape[0]:
            np.testing.assert_allclose(arr[i, : kept.shape[0]], kept, rtol=1e-6)


@pytest.mark.parametrize("seed", CONFIGS[:15])
def test_combine_data_roundtrip(seed):
    """split -> combine_data reproduces the original RaggedBatch."""
    from accvlab_tpu.ragged import combine_data

    rng = np.random.default_rng(500 + seed)
    b, smax, d, sizes, tensor = draw(rng)
    rb = RaggedBatch(jnp.asarray(tensor), sample_sizes=jnp.asarray(sizes))
    rebuilt = combine_data(rb.split())
    np.testing.assert_array_equal(np.asarray(rebuilt.sample_sizes), sizes)
    np.testing.assert_allclose(
        np.asarray(rebuilt.with_padded_set_to(0.0).tensor),
        np.asarray(rb.with_padded_set_to(0.0).tensor),
        rtol=1e-6,
    )


@pytest.mark.parametrize("seed", CONFIGS[:10])
def test_heatmap_batched_fuzz_vs_golden(seed):
    """Random heatmap configs vs the scalar golden draw (same oracle as
    test_heatmap, broader shapes/target counts)."""
    from accvlab_tpu.heatmap import draw_heatmap_batched
    from test_heatmap import golden_draw

    rng = np.random.default_rng(600 + seed)
    b = int(rng.integers(1, 4))
    h, w = int(rng.integers(8, 24)), int(rng.integers(8, 40))
    tmax = int(rng.integers(1, 8))
    sizes = rng.integers(0, tmax + 1, (b,)).astype(np.int32)
    if sizes.max() == 0:
        sizes[0] = 1
    tmax = int(sizes.max())
    xs = rng.integers(0, w, (b, tmax)).astype(np.int32)
    ys = rng.integers(0, h, (b, tmax)).astype(np.int32)
    rad = rng.integers(0, 5, (b, tmax)).astype(np.int32)
    hm0 = rng.uniform(0, 0.3, (b, h, w)).astype(np.float32)

    centers = RaggedBatch(
        jnp.asarray(np.stack([xs, ys], -1)), sample_sizes=jnp.asarray(sizes)
    )
    radii = centers.create_with_sample_sizes_like_self(jnp.asarray(rad))
    out = np.asarray(draw_heatmap_batched(jnp.asarray(hm0), centers, radii))

    expect = hm0.copy()
    for i in range(b):
        for t in range(int(sizes[i])):
            expect[i] = golden_draw(expect[i], int(xs[i, t]), int(ys[i, t]), int(rad[i, t]))
    np.testing.assert_allclose(out, expect, rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("seed", CONFIGS[:10])
def test_polyline_fuzz_vs_golden(seed):
    from accvlab_tpu.polyline import interpolate
    from test_polyline import golden_interpolate

    rng = np.random.default_rng(700 + seed)
    b = int(rng.integers(1, 4))
    n = int(rng.integers(2, 9))
    nd = int(rng.integers(0, 9))
    pts = rng.uniform(-5, 5, (b, n, 2)).astype(np.float32)
    dists = rng.uniform(-1, 12, (b, max(1, nd))).astype(np.float32)
    rel = bool(rng.integers(0, 2))
    if rel:
        dists = rng.uniform(-0.2, 1.2, dists.shape).astype(np.float32)

    out = np.asarray(interpolate(jnp.asarray(pts), jnp.asarray(dists), relative=rel))
    for i in range(b):
        expect = golden_interpolate(pts[i], dists[i], relative=rel)
        np.testing.assert_allclose(out[i], expect, rtol=2e-4, atol=2e-5)
