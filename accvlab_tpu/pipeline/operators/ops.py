"""Core array operators (parity: reference ``numba_operators.py``; line refs
per function). All functions take/return per-sample arrays and dispatch to
numpy or jnp based on the input type, so they fuse into the device program
when used after the host/device boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


from ..._array_ns import xp_for as _xp  # shared numpy-vs-jnp dispatch


def pad_to_size(data, size: int, fill_value=0.0):
    """Pad (or truncate) ``dim==0`` to ``size``. Parity: ``numba_operators.py:25``."""
    xp = _xp(data)
    n = data.shape[0]
    if n >= size:
        return data[:size]
    pad = [(0, size - n)] + [(0, 0)] * (data.ndim - 1)
    if xp is np:
        return np.pad(data, pad, constant_values=fill_value)
    return xp.pad(data, pad, constant_values=fill_value)


def remove_inactive(data, active_mask, masked_dimension: int = 0):
    """Remove entries where ``active_mask`` is False along ``masked_dimension``.

    Parity: ``numba_operators.py:69``. Output shape is data dependent —
    host-only (numpy); on-device use :func:`accvlab_tpu.ragged.compact_by_mask`
    with a static bound instead.
    """
    data = np.asarray(data)
    mask = np.asarray(active_mask).astype(bool)
    if masked_dimension != 0:
        data = np.moveaxis(data, masked_dimension, 0)
    res = data[mask]
    if masked_dimension != 0:
        res = np.moveaxis(res, 0, masked_dimension)
    return res


def ensure_range(data, min_value: float, max_value: float, period: float):
    """Shift out-of-range values into ``[min_value, max_value]`` by integer
    multiples of ``period`` (e.g. angle wrapping). Parity: ``numba_operators.py:129``."""
    xp = _xp(data)
    data = xp.asarray(data)
    too_low = data < min_value
    too_high = data > max_value
    add = xp.ceil((min_value - data) / period) * period
    sub = xp.ceil((data - max_value) / period) * period
    res = xp.where(too_low, data + add, data)
    res = xp.where(too_high, data - sub, res)
    return res.astype(data.dtype)


def replace_nans(data, replacement_value: float):
    """Replace NaNs. Parity: ``numba_operators.py:193``."""
    xp = _xp(data)
    data = xp.asarray(data)
    return xp.where(xp.isnan(data), xp.asarray(replacement_value, data.dtype), data)


def check_bbox_visibility(
    bboxes, depths, image_hw, shrink_bbox_to_obtain_int_coords: bool = False
):
    """Occlusion-aware visibility mask via painter's algorithm.

    Boxes are rasterized far-to-near onto an index canvas; a box is visible
    iff its index survives anywhere. Parity: ``numba_operators.py:241``
    (inherently sequential raster loop -> host/numpy only, like the
    reference's CPU numba op).
    """
    bboxes = np.asarray(bboxes, np.float32)
    depths = np.asarray(depths, np.float32)
    image_hw = np.asarray(image_hw, np.int32)
    h, w = int(image_hw[0]), int(image_hw[1])
    canvas = np.full((h, w), -1, np.int32)
    for doi in np.argsort(-depths):
        box = bboxes[doi]
        min_x, max_x = (box[0], box[2]) if box[0] < box[2] else (box[2], box[0])
        min_y, max_y = (box[1], box[3]) if box[1] < box[3] else (box[3], box[1])
        if shrink_bbox_to_obtain_int_coords:
            min_x, min_y = int(np.ceil(min_x)), int(np.ceil(min_y))
            max_x, max_y = int(np.floor(max_x)), int(np.floor(max_y))
        else:
            min_x, min_y = int(np.floor(min_x)), int(np.floor(min_y))
            max_x, max_y = int(np.ceil(max_x)), int(np.ceil(max_y))
        if min_x > w or max_x < 0 or min_y > h or max_y < 0:
            continue
        canvas[max(min_y, 0) : min(max_y, h), max(min_x, 0) : min(max_x, w)] = doi
    mask = np.zeros((bboxes.shape[0],), bool)
    visible = np.unique(canvas)
    mask[visible[visible >= 0]] = True
    return mask


def check_minimum_bbox_size(bboxes, min_size: float, image_hw):
    """True where the image-clipped box is at least ``min_size`` in both x and
    y. Parity: ``numba_operators.py:349``."""
    xp = _xp(bboxes)
    bboxes = xp.asarray(bboxes, dtype=np.float32)
    h = image_hw[0]
    w = image_hw[1]
    x1 = xp.clip(bboxes[:, 0], 0.0, w)
    x2 = xp.clip(bboxes[:, 2], 0.0, w)
    y1 = xp.clip(bboxes[:, 1], 0.0, h)
    y2 = xp.clip(bboxes[:, 3], 0.0, h)
    return (xp.abs(x2 - x1) >= min_size) & (xp.abs(y2 - y1) >= min_size)


def check_points_in_box(points, min_point: Sequence[float], max_point: Sequence[float]):
    """True where a point lies inside the (closed) box in every dimension.
    Parity: ``numba_operators.py:407``."""
    xp = _xp(points)
    points = xp.asarray(points)
    lo = xp.asarray(np.asarray(min_point, np.float32))[None, :]
    hi = xp.asarray(np.asarray(max_point, np.float32))[None, :]
    return xp.all((points >= lo) & (points <= hi), axis=1)


def crop_coordinates(points, min_point: Sequence[float], max_point: Sequence[float]):
    """Clip each coordinate into the box. Parity: ``numba_operators.py:459``."""
    xp = _xp(points)
    points = xp.asarray(points)
    lo = xp.asarray(np.asarray(min_point, points.dtype))[None, :]
    hi = xp.asarray(np.asarray(max_point, points.dtype))[None, :]
    return xp.clip(points, lo, hi)


def get_rot_mat_from_rot_vector(rot_vector, as_homog: bool = False, eps: float = 1e-7):
    """Rodrigues rotation-vector -> 3x3 (or homogeneous 4x4) rotation matrix.
    Parity: ``numba_operators.py:513``."""
    xp = _xp(rot_vector)
    v = xp.asarray(rot_vector, dtype=np.float32)
    angle = xp.sqrt(xp.sum(v * v))
    safe_angle = xp.where(angle < eps, 1.0, angle)
    axis = v / safe_angle
    zero = xp.zeros((), np.float32)
    cross = xp.stack(
        [
            xp.stack([zero, -axis[2], axis[1]]),
            xp.stack([axis[2], zero, -axis[0]]),
            xp.stack([-axis[1], axis[0], zero]),
        ]
    )
    eye = xp.eye(3, dtype=np.float32)
    rot = eye + xp.sin(angle) * cross + (1.0 - xp.cos(angle)) * (cross @ cross)
    rot = xp.where(angle < eps, eye, rot)
    if as_homog:
        out = xp.zeros((4, 4), np.float32)
        if xp is np:
            out[:3, :3] = rot
            out[3, 3] = 1.0
        else:
            out = out.at[:3, :3].set(rot).at[3, 3].set(1.0)
        return out
    return rot.astype(np.float32)


def get_translation_mat_from_vector(translation):
    """Translation vector -> homogeneous 4x4. Parity: ``numba_operators.py:581``."""
    xp = _xp(translation)
    t = xp.asarray(translation, dtype=np.float32)
    eye = xp.eye(4, dtype=np.float32)
    if xp is np:
        res = eye.copy()
        res[:3, 3] = t
        return res
    return eye.at[:3, 3].set(t)


def get_scaling_mat_from_vector(scaling, as_homog: bool = False):
    """Per-axis scaling vector -> 3x3 (or homogeneous 4x4) matrix.
    Parity: ``numba_operators.py:619``."""
    xp = _xp(scaling)
    s = xp.asarray(scaling, dtype=np.float32)
    size = 4 if as_homog else 3
    diag = xp.concatenate([s[:3], xp.ones((size - 3,), np.float32)]) if as_homog else s[:3]
    return xp.diag(diag).astype(np.float32)


def apply_matrix(
    to_apply_to,
    matrix,
    in_homog: bool = False,
    to_apply_to_is_transposed: bool = False,
    matrix_is_transposed: bool = False,
    matrix_is_inverted: bool = False,
    multiply_matrix_from_right: bool = False,
    make_apply_to_homog: Optional[bool] = None,
):
    """Apply a matrix to a point set (optionally homogeneous / transposed /
    inverted / right-multiplied). Parity: ``numba_operators.py:733``.

    ``to_apply_to`` is (D, N), or (N, D) with ``to_apply_to_is_transposed``;
    1-D inputs are treated as a single vector. ``make_apply_to_homog`` is the
    reference's keyword name for ``in_homog``.
    """
    if make_apply_to_homog is not None:
        in_homog = make_apply_to_homog
    xp = _xp(to_apply_to) if _xp(to_apply_to) is not np else _xp(matrix)
    data = xp.asarray(to_apply_to, dtype=np.float32)
    was_1d = data.ndim == 1
    if was_1d:
        data = data.reshape(-1, 1)
        to_apply_to_is_transposed = False
    mat = xp.asarray(matrix, dtype=np.float32)
    if to_apply_to_is_transposed:
        data = data.T
    if in_homog:
        ones = xp.ones((1, data.shape[1]), np.float32)
        data = xp.concatenate([data, ones], axis=0)
    if matrix_is_transposed:
        mat = mat.T
    if matrix_is_inverted:
        mat = xp.linalg.inv(mat)
    data = (data @ mat) if multiply_matrix_from_right else (mat @ data)
    if in_homog:
        data = data[:-1, :] / data[-1:, :]
    if to_apply_to_is_transposed:
        data = data.T
    if was_1d:
        data = data.reshape(-1)
    return data


def get_center_from_bboxes(bboxes):
    """Box centers from [x1, y1, x2, y2] boxes. Parity: ``numba_operators.py:788``."""
    xp = _xp(bboxes)
    b = xp.asarray(bboxes, dtype=np.float32)
    return xp.stack([(b[:, 0] + b[:, 2]) * 0.5, (b[:, 1] + b[:, 3]) * 0.5], axis=1)


def get_radii_from_bboxes(bboxes, scaling_factor: float = 0.8, centers=None):
    """Gaussian radius per box: min distance from the center to any box edge,
    clamped at 0, times ``scaling_factor``. Parity: ``numba_operators.py:830``."""
    xp = _xp(bboxes)
    b = xp.asarray(bboxes, dtype=np.float32)
    c = get_center_from_bboxes(b) if centers is None else xp.asarray(centers, dtype=np.float32)
    left = xp.minimum(b[:, 0], b[:, 2])
    right = xp.maximum(b[:, 0], b[:, 2])
    top = xp.minimum(b[:, 1], b[:, 3])
    bottom = xp.maximum(b[:, 1], b[:, 3])
    dists = xp.stack(
        [c[:, 0] - left, c[:, 1] - top, right - c[:, 0], bottom - c[:, 1]], axis=1
    )
    return xp.maximum(0.0, xp.min(dists, axis=1)) * np.float32(scaling_factor)


# The reference exports this function under a misspelled name
# (``numba_operators/__init__.py``: ``check_bbox_visibiity``); keep the alias
# so reference call sites resolve unchanged.
check_bbox_visibiity = check_bbox_visibility
