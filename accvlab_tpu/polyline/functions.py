"""Polyline arc-length interpolation (TPU-native).

Re-design of ACCV-Lab's ``lane_helpers`` polyline extension
(``packages/lane_helpers/accvlab/lane_helpers/polyline/functions.py:27-120``,
kernels in ``ext_impl/polyline/src/polyline_cpu.cpp`` /
``include/polyline_common.cuh:126-160``) as pure vectorized JAX:
prefix-sum of segment lengths + per-sample ``searchsorted`` + lerp. This
vectorizes perfectly on the VPU — no custom kernel needed (the reference's
shared-memory staging kernel exists to work around CUDA's memory hierarchy).

Semantics parity:

* distances below 0 clamp to the first point; beyond total length clamp to
  the last (valid) point; ``relative=True`` scales by total length first.
* a segment shorter than float eps contributes its first point (no divide).
* empty polylines (0 points) produce NaN samples and NaN length.
* unlike the reference, the functions are differentiable end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ragged import RaggedBatch

Array = jax.Array


def _accum_distances(points: Array, num_valid=None) -> Array:
    """Per-sample prefix-sum of segment lengths. points (B, N, D) -> (B, N)."""
    diffs = points[:, 1:] - points[:, :-1]
    seg = jnp.sqrt(jnp.sum(diffs * diffs, axis=-1))  # (B, N-1)
    if num_valid is not None:
        # zero out segments past the valid range so accum plateaus at the total
        seg_idx = jnp.arange(seg.shape[1])
        seg = jnp.where(seg_idx[None, :] < num_valid[:, None] - 1, seg, 0.0)
    zeros = jnp.zeros((points.shape[0], 1), dtype=seg.dtype)
    return jnp.concatenate([zeros, jnp.cumsum(seg, axis=1)], axis=1)


def _interpolate_impl(points, distances, relative, num_points_valid, num_dist_valid):
    b, n, d = points.shape
    if n == 0:
        return jnp.full((b, distances.shape[1], d), jnp.nan, dtype=points.dtype)

    accum = _accum_distances(points, num_points_valid)
    if num_points_valid is None:
        nv = jnp.full((b,), n, dtype=jnp.int32)
    else:
        nv = num_points_valid.astype(jnp.int32)
    total = jnp.take_along_axis(accum, jnp.maximum(nv - 1, 0)[:, None], axis=1)[:, 0]

    dist = distances.astype(accum.dtype)
    if relative:
        dist = dist * total[:, None]

    # index of last accum entry <= dist (the reference's binary search,
    # polyline_common.cuh:75-124); equal runs resolve to the last entry.
    idx = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(accum, dist) - 1

    last = jnp.maximum(nv - 1, 0)[:, None]
    below = idx < 0  # distance < 0 -> first point
    beyond = idx >= last  # distance >= total -> last valid point

    lo = jnp.clip(idx, 0, jnp.maximum(n - 2, 0))
    hi = jnp.minimum(lo + 1, n - 1)
    d_lo = jnp.take_along_axis(accum, lo, axis=1)
    d_hi = jnp.take_along_axis(accum, hi, axis=1)
    seg_len = d_hi - d_lo
    eps = jnp.finfo(accum.dtype).eps
    w_hi = jnp.where(seg_len >= eps, (dist - d_lo) / jnp.where(seg_len >= eps, seg_len, 1.0), 0.0)

    p_lo = jnp.take_along_axis(points, lo[:, :, None], axis=1)
    p_hi = jnp.take_along_axis(points, hi[:, :, None], axis=1)
    interp = p_lo + (p_hi - p_lo) * w_hi[:, :, None].astype(points.dtype)

    p_first = points[:, 0:1]
    p_last = jnp.take_along_axis(points, last[:, :, None], axis=1)
    res = jnp.where(below[:, :, None], jnp.broadcast_to(p_first, interp.shape), interp)
    res = jnp.where(beyond[:, :, None], jnp.broadcast_to(p_last, interp.shape), res)

    # empty polylines -> NaN (reference fill_point_with_nan_common)
    empty = (nv == 0)[:, None, None]
    res = jnp.where(empty, jnp.nan, res)
    if num_dist_valid is not None:
        valid_d = jnp.arange(distances.shape[1]) < num_dist_valid[:, None]
        res = jnp.where(valid_d[:, :, None], res, 0.0)
    return res


def interpolate(points: Array, distances: Array, *, relative: bool = False) -> Array:
    """Interpolate batched polylines at requested distances.

    Parity: ``polyline/functions.py:27``.

    Args:
        points: ``(batch, num_points, num_dims)``.
        distances: ``(batch, num_distances)``; clamped to the polyline ends.
        relative: interpret distances as fractions of total length.

    Returns:
        ``(batch, num_distances, num_dims)``.
    """
    points = jnp.asarray(points)
    distances = jnp.asarray(distances)
    return _interpolate_impl(points, distances, relative, None, None)


def lengths(points: Array) -> Array:
    """Total length of each polyline in a fixed-size batch.

    Parity: ``polyline/functions.py:46``. Empty polylines -> NaN.
    """
    points = jnp.asarray(points)
    if points.shape[1] == 0:
        return jnp.full((points.shape[0],), jnp.nan, dtype=points.dtype)
    return _accum_distances(points)[:, -1].astype(points.dtype)


def interpolate_var_size_batch(
    points: RaggedBatch, distances: RaggedBatch, *, relative: bool = False
) -> RaggedBatch:
    """Interpolate variable-length batched polylines.

    Parity: ``polyline/functions.py:59``.
    """
    assert points.num_batch_dims == 1, "points must have exactly one batch dimension"
    assert distances.num_batch_dims == 1, "distances must have exactly one batch dimension"
    assert points.non_uniform_dim == 1, (
        "points.non_uniform_dim must be 1 for shape (batch, max_num_points, num_dims)"
    )
    assert distances.non_uniform_dim == 1, (
        "distances.non_uniform_dim must be 1 for shape (batch, max_num_distances)"
    )
    res = _interpolate_impl(
        points.tensor,
        distances.tensor,
        relative,
        points.sample_sizes,
        distances.sample_sizes,
    )
    return distances.create_with_sample_sizes_like_self(res)


def lengths_var_size_batch(points: RaggedBatch) -> Array:
    """Total length of each polyline in a variable-size batch.

    Parity: ``polyline/functions.py:98``. Empty polylines -> NaN.
    """
    assert points.num_batch_dims == 1, "points must have exactly one batch dimension"
    assert points.non_uniform_dim == 1, (
        "points.non_uniform_dim must be 1 for shape (batch, max_num_points, num_dims)"
    )
    t = points.tensor
    nv = points.sample_sizes.astype(jnp.int32)
    if t.shape[1] == 0:
        return jnp.full((t.shape[0],), jnp.nan, dtype=t.dtype)
    accum = _accum_distances(t, nv)
    total = jnp.take_along_axis(accum, jnp.maximum(nv - 1, 0)[:, None], axis=1)[:, 0]
    return jnp.where(nv == 0, jnp.nan, total).astype(t.dtype)
