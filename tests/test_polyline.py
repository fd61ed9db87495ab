"""Polyline tests: analytic expectations + numpy golden model
(model: reference lane_helpers/tests, CPU-vs-CUDA parity + analytic cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accvlab_tpu.polyline import (
    interpolate,
    interpolate_var_size_batch,
    lengths,
    lengths_var_size_batch,
)
from accvlab_tpu.ragged import RaggedBatch


def golden_interpolate(points, dists, relative=False):
    """Scalar reference: prefix sums + linear interpolation with end clamping."""
    seg = np.linalg.norm(np.diff(points, axis=0), axis=1)
    accum = np.concatenate([[0.0], np.cumsum(seg)])
    total = accum[-1]
    out = np.zeros((len(dists), points.shape[1]), np.float32)
    for k, d in enumerate(dists):
        if relative:
            d = d * total
        if d < 0:
            out[k] = points[0]
        elif d >= total:
            out[k] = points[-1]
        else:
            i = int(np.searchsorted(accum, d, side="right")) - 1
            if accum[i + 1] - accum[i] < np.finfo(np.float32).eps:
                out[k] = points[i]
            else:
                w = (d - accum[i]) / (accum[i + 1] - accum[i])
                out[k] = points[i] * (1 - w) + points[i + 1] * w
    return out


def test_straight_line():
    pts = jnp.array([[[0.0, 0.0], [10.0, 0.0]]])
    d = jnp.array([[0.0, 2.5, 5.0, 10.0]])
    out = interpolate(pts, d)
    np.testing.assert_allclose(
        np.asarray(out[0]), [[0, 0], [2.5, 0], [5, 0], [10, 0]], atol=1e-6
    )


def test_clamping():
    pts = jnp.array([[[0.0, 0.0], [4.0, 0.0]]])
    d = jnp.array([[-3.0, 99.0]])
    out = interpolate(pts, d)
    np.testing.assert_allclose(np.asarray(out[0]), [[0, 0], [4, 0]], atol=1e-6)


def test_relative():
    pts = jnp.array([[[0.0, 0.0], [0.0, 8.0]]])
    d = jnp.array([[0.25, 0.5, 1.5]])
    out = interpolate(pts, d, relative=True)
    np.testing.assert_allclose(np.asarray(out[0]), [[0, 2], [0, 4], [0, 8]], atol=1e-5)


def test_multi_segment_golden():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(3, 7, 3)).astype(np.float32)
    d = rng.uniform(-1, 10, size=(3, 9)).astype(np.float32)
    out = np.asarray(interpolate(jnp.asarray(pts), jnp.asarray(d)))
    for b in range(3):
        np.testing.assert_allclose(out[b], golden_interpolate(pts[b], d[b]), atol=1e-4)


def test_lengths():
    pts = jnp.array([[[0.0, 0.0], [3.0, 4.0], [3.0, 14.0]]])
    np.testing.assert_allclose(np.asarray(lengths(pts)), [15.0], atol=1e-5)


def test_lengths_empty():
    pts = jnp.zeros((2, 0, 2))
    out = np.asarray(lengths(pts))
    assert np.all(np.isnan(out))


def test_single_point():
    pts = jnp.array([[[2.0, 3.0]]])
    d = jnp.array([[0.0, 1.0, -1.0]])
    out = interpolate(pts, d)
    np.testing.assert_allclose(np.asarray(out[0]), [[2, 3]] * 3, atol=1e-6)


def test_var_size_batch():
    pts = RaggedBatch(
        jnp.array(
            [
                [[0.0, 0.0], [10.0, 0.0], [99.0, 99.0]],  # 2 valid points
                [[0.0, 0.0], [0.0, 2.0], [0.0, 4.0]],  # 3 valid points
            ]
        ),
        sample_sizes=jnp.array([2, 3]),
    )
    dists = RaggedBatch(
        jnp.array([[5.0, 0.0], [3.0, 0.0]]), sample_sizes=jnp.array([1, 2])
    )
    out = interpolate_var_size_batch(pts, dists)
    assert isinstance(out, RaggedBatch)
    np.testing.assert_allclose(np.asarray(out.tensor[0, 0]), [5.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.tensor[1, 0]), [0.0, 3.0], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.sample_sizes), [1, 2])


def test_var_size_clamps_to_valid_last_point():
    # distance beyond the *valid* length must clamp to the last valid point,
    # not a padded garbage point
    pts = RaggedBatch(
        jnp.array([[[0.0, 0.0], [1.0, 0.0], [500.0, 500.0]]]),
        sample_sizes=jnp.array([2]),
    )
    dists = RaggedBatch(jnp.array([[50.0]]), sample_sizes=jnp.array([1]))
    out = interpolate_var_size_batch(pts, dists)
    np.testing.assert_allclose(np.asarray(out.tensor[0, 0]), [1.0, 0.0], atol=1e-6)


def test_var_size_lengths():
    pts = RaggedBatch(
        jnp.array(
            [
                [[0.0, 0.0], [3.0, 4.0], [100.0, 100.0]],
                [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]],
            ]
        ),
        sample_sizes=jnp.array([2, 3]),
    )
    out = np.asarray(lengths_var_size_batch(pts))
    np.testing.assert_allclose(out, [5.0, 2.0], atol=1e-5)


def test_var_size_empty_polyline_nan():
    pts = RaggedBatch(jnp.zeros((2, 3, 2)), sample_sizes=jnp.array([0, 2]))
    out = np.asarray(lengths_var_size_batch(pts))
    assert np.isnan(out[0]) and out[1] == pytest.approx(0.0)
    dists = RaggedBatch(jnp.array([[1.0], [1.0]]), sample_sizes=jnp.array([1, 1]))
    samples = interpolate_var_size_batch(pts, dists)
    assert np.all(np.isnan(np.asarray(samples.tensor[0, 0])))


def test_relative_var_size():
    pts = RaggedBatch(
        jnp.array([[[0.0, 0.0], [0.0, 10.0], [7.0, 7.0]]]), sample_sizes=jnp.array([2])
    )
    dists = RaggedBatch(jnp.array([[0.5]]), sample_sizes=jnp.array([1]))
    out = interpolate_var_size_batch(pts, dists, relative=True)
    np.testing.assert_allclose(np.asarray(out.tensor[0, 0]), [0.0, 5.0], atol=1e-5)


def test_jit_and_grad():
    pts = jnp.array([[[0.0, 0.0], [10.0, 0.0]]])
    d = jnp.array([[5.0]])

    @jax.jit
    def f(p):
        return jnp.sum(interpolate(p, d))

    g = jax.grad(f)(pts)
    assert g.shape == pts.shape
    # sampling at a fixed absolute distance: shifting the start point moves the
    # sample 1:1; moving the far endpoint (while it stays beyond the sample
    # distance) does not move the sample at all
    np.testing.assert_allclose(np.asarray(g[0, :, 0]), [1.0, 0.0], atol=1e-5)


def test_lane_regression_example_converges():
    """The polyline subsystem supports end-to-end training (differentiable
    resampling inside the loss) — short smoke run of the example."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))
    import lane_regression_training as ex

    first, last = ex.run(num_steps=40, batch_size=16, verbose=False)
    assert last < first * 0.5
