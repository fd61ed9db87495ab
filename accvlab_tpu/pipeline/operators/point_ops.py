"""Point/projection operator functions (parity: reference
``operators_impl/python_operator_functions/python_operator_functions.py``;
line refs per function). numpy/jnp dual-dispatch like :mod:`.ops`."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .ops import _xp


def apply_transform_to_points(points, transform):
    """Apply a homogeneous 2-D transform to a point set whose rows hold one or
    more (x, y) pairs. Parity: ``python_operator_functions.py:24``.

    ``points``: (N, 2*k); ``transform``: (2, 3) or (3, 3).
    """
    xp = _xp(points) if _xp(points) is not np else _xp(transform)
    points = xp.asarray(points, dtype=np.float32)
    transform = xp.asarray(transform, dtype=np.float32)
    if points.size == 0:
        return xp.zeros_like(points)
    row_length = points.shape[1]
    num_points_per_row = row_length // 2
    if num_points_per_row * 2 != row_length:
        raise ValueError(
            "apply_transform_to_points(): rows must contain (x, y) pairs, got "
            f"a row length of {row_length}."
        )
    outs = []
    for i in range(num_points_per_row):
        pts = points[:, 2 * i : 2 * i + 2].T  # (2, N)
        ones = xp.ones((1, pts.shape[1]), np.float32)
        homog = xp.concatenate([pts, ones], axis=0)
        out = transform @ homog  # (2or3, N)
        outs.append(out[:2].T)
    return xp.concatenate(outs, axis=1).astype(points.dtype)


def add_post_transform_to_projection_matrix(proj_mat, transform):
    """Left-compose a 2x3 image-space transform onto a 3x? projection matrix.
    Parity: ``python_operator_functions.py:78``."""
    xp = _xp(proj_mat) if _xp(proj_mat) is not np else _xp(transform)
    proj_mat = xp.asarray(proj_mat, dtype=np.float32)
    transform = xp.asarray(transform, dtype=np.float32)
    bottom = xp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    full = xp.concatenate([transform, bottom], axis=0)
    return full @ proj_mat


def apply_clipping_and_get_with_clipping_info(
    rects, centers, scaling_trafo, image_hw
) -> Tuple:
    """Transform boxes/centers by a homogeneous 2-D transform, clip to the
    image, and report clipped sizes + surviving area fraction.
    Parity: ``python_operator_functions.py:103``.

    Returns ``(rects_clipped, centers_clipped, hw_clipped, fraction_area)``.
    """
    xp = _xp(rects)
    rects = xp.asarray(rects, dtype=np.float32)
    centers = xp.asarray(centers, dtype=np.float32)
    trafo = xp.asarray(scaling_trafo, dtype=np.float32)
    h = image_hw[0]
    w = image_hw[1]

    def transform(pts):  # (N, 2) -> (N, 2)
        ones = xp.ones((1, pts.shape[0]), np.float32)
        homog = xp.concatenate([pts.T, ones], axis=0)
        return (trafo @ homog)[:2].T

    p1 = transform(rects[:, :2])
    p2 = transform(rects[:, 2:])
    rects_scaled = xp.concatenate([p1, p2], axis=1)

    x1c = xp.clip(rects_scaled[:, 0], 0, w - 1)
    y1c = xp.clip(rects_scaled[:, 1], 0, h - 1)
    x2c = xp.clip(rects_scaled[:, 2], 0, w - 1)
    y2c = xp.clip(rects_scaled[:, 3], 0, h - 1)
    rects_clipped = xp.stack([x1c, y1c, x2c, y2c], axis=1)

    h_clipped = xp.abs(y2c - y1c)
    w_clipped = xp.abs(x2c - x1c)
    h_orig = xp.abs(rects_scaled[:, 3] - rects_scaled[:, 1])
    w_orig = xp.abs(rects_scaled[:, 2] - rects_scaled[:, 0])
    hw_clipped = xp.stack([h_clipped, w_clipped], axis=1)
    fraction_area = (h_clipped * w_clipped) / (h_orig * w_orig)

    c = transform(centers)
    centers_clipped = xp.stack(
        [xp.clip(c[:, 0], 0, w - 1), xp.clip(c[:, 1], 0, h - 1)], axis=1
    )
    return rects_clipped, centers_clipped, hw_clipped, fraction_area


def get_is_active(
    hw,
    classes,
    fraction_areas,
    min_object_size,
    per_class_min_object_sizes,
    num_classes: int,
    min_fraction_area_thresh: float,
):
    """Per-object active mask from class validity, min (per-class) size, and
    surviving-area fraction. Parity: ``python_operator_functions.py:175``."""
    xp = _xp(hw)
    hw = xp.asarray(hw, dtype=np.float32)
    fraction_areas = xp.asarray(fraction_areas, dtype=np.float32)
    n = hw.shape[0]

    if classes is not None:
        classes = xp.asarray(classes)
        active_classes = classes < num_classes
        safe_classes = xp.where(active_classes, classes, 0).astype(np.int32)
        if per_class_min_object_sizes is not None:
            sizes = xp.asarray(per_class_min_object_sizes, dtype=np.float32)
            active_size = (hw[:, 0] >= sizes[safe_classes, 0]) & (
                hw[:, 1] >= sizes[safe_classes, 1]
            )
        elif min_object_size is not None:
            mo = xp.asarray(min_object_size, dtype=np.float32)
            active_size = (hw[:, 0] >= mo[0]) & (hw[:, 1] >= mo[1])
        else:
            active_size = xp.ones((n,), bool)
    else:
        active_classes = xp.ones((n,), bool)
        if min_object_size is not None:
            mo = xp.asarray(min_object_size, dtype=np.float32)
            active_size = (hw[:, 0] >= mo[0]) & (hw[:, 1] >= mo[1])
        else:
            active_size = xp.ones((n,), bool)

    active_area = fraction_areas >= min_fraction_area_thresh
    return active_classes & active_size & active_area


def pad_to_common_size(*inputs, fill_value: float) -> Tuple:
    """Pad all inputs to their element-wise maximum shape (host/numpy).
    Parity: ``python_operator_functions.py:256``."""
    inputs = [np.asarray(inp) for inp in inputs]
    shapes = np.stack([np.array(inp.shape) for inp in inputs], axis=0)
    max_shape = shapes.max(axis=0)
    return tuple(
        np.pad(
            inp,
            [(0, int(max_shape[d] - inp.shape[d])) for d in range(inp.ndim)],
            constant_values=fill_value,
        )
        for inp in inputs
    )
