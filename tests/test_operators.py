"""Direct semantics tests for the operator functions (``pipeline/operators``).

The 14 array operators (parity: reference ``numba_operators.py``) and 5
point/projection functions (``python_operator_functions.py``) were covered
only indirectly through the processing steps that call some of them; these
tests pin each function's contract against independent oracles (scipy
Rotation for Rodrigues, brute-force rasterization for visibility, manual
geometry elsewhere) plus numpy-vs-jnp dispatch parity for the jit-capable
ones."""

import numpy as np
import pytest

import jax.numpy as jnp

from accvlab_tpu.pipeline.operators import (
    add_post_transform_to_projection_matrix,
    apply_clipping_and_get_with_clipping_info,
    apply_matrix,
    apply_transform_to_points,
    check_bbox_visibility,
    check_minimum_bbox_size,
    check_points_in_box,
    crop_coordinates,
    ensure_range,
    get_center_from_bboxes,
    get_is_active,
    get_radii_from_bboxes,
    get_rot_mat_from_rot_vector,
    get_scaling_mat_from_vector,
    get_translation_mat_from_vector,
    pad_to_common_size,
    pad_to_size,
    remove_inactive,
    replace_nans,
)


def test_pad_to_size_pads_truncates_and_fills():
    d = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = pad_to_size(d, 5, fill_value=-1.0)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[:3], d)
    assert (out[3:] == -1.0).all()
    np.testing.assert_array_equal(pad_to_size(d, 2), d[:2])
    # jnp dispatch parity
    np.testing.assert_array_equal(
        np.asarray(pad_to_size(jnp.asarray(d), 5, fill_value=-1.0)), out
    )


def test_remove_inactive_and_axis():
    d = np.arange(12).reshape(4, 3)
    m = np.array([True, False, True, False])
    np.testing.assert_array_equal(remove_inactive(d, m), d[[0, 2]])
    np.testing.assert_array_equal(
        remove_inactive(d, [True, False, True], masked_dimension=1), d[:, [0, 2]]
    )


def test_ensure_range_wraps_by_period():
    x = np.array([-4.5, -3.2, 0.0, 3.2, 9.9, np.pi], np.float32)
    lo, hi, period = -np.pi, np.pi, 2 * np.pi
    out = np.asarray(ensure_range(x, lo, hi, period))
    assert ((out >= lo - 1e-5) & (out <= hi + 1e-5)).all()
    # shifted by an integer multiple of the period
    k = (out - x) / period
    np.testing.assert_allclose(k, np.round(k), atol=1e-5)
    # in-range values untouched
    np.testing.assert_array_equal(out[2], x[2])
    np.testing.assert_array_equal(
        np.asarray(ensure_range(jnp.asarray(x), lo, hi, period)), out
    )


def test_replace_nans():
    x = np.array([1.0, np.nan, 3.0], np.float32)
    np.testing.assert_array_equal(
        np.asarray(replace_nans(x, 7.0)), [1.0, 7.0, 3.0]
    )


def test_check_bbox_visibility_painters_algorithm():
    image_hw = [20, 20]
    # box 0 near and big; box 1 far, FULLY occluded by box 0; box 2 far but
    # sticking out; box 3 entirely off-image
    bboxes = np.array(
        [
            [2.0, 2.0, 12.0, 12.0],
            [4.0, 4.0, 8.0, 8.0],
            [10.0, 10.0, 16.0, 16.0],
            [30.0, 30.0, 40.0, 40.0],
        ],
        np.float32,
    )
    depths = np.array([1.0, 5.0, 5.0, 2.0], np.float32)
    vis = check_bbox_visibility(bboxes, depths, image_hw)
    np.testing.assert_array_equal(vis, [True, False, True, False])
    # shrink-to-int: a sub-pixel box vanishes
    tiny = np.array([[5.2, 5.2, 5.8, 5.8]], np.float32)
    assert not check_bbox_visibility(
        tiny, np.array([1.0], np.float32), image_hw, True
    )[0]
    assert check_bbox_visibility(tiny, np.array([1.0], np.float32), image_hw)[0]


def test_check_minimum_bbox_size_clips_to_image():
    image_hw = [10, 10]
    boxes = np.array(
        [
            [0.0, 0.0, 5.0, 5.0],   # 5x5
            [-10.0, 0.0, 2.0, 9.0],  # clipped to 2x9
            [8.0, 8.0, 30.0, 30.0],  # clipped to 2x2
        ],
        np.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(check_minimum_bbox_size(boxes, 3.0, image_hw)),
        [True, False, False],
    )


def test_points_in_box_and_crop():
    pts = np.array([[0.5, 0.5], [2.0, 0.1], [-1.0, 0.9]], np.float32)
    inside = np.asarray(check_points_in_box(pts, [0.0, 0.0], [1.0, 1.0]))
    np.testing.assert_array_equal(inside, [True, False, False])
    cropped = np.asarray(crop_coordinates(pts, [0.0, 0.0], [1.0, 1.0]))
    np.testing.assert_allclose(cropped, [[0.5, 0.5], [1.0, 0.1], [0.0, 0.9]])


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    for _ in range(5):
        v = rng.standard_normal(3).astype(np.float32)
        want = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(
            np.asarray(get_rot_mat_from_rot_vector(v)), want, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(get_rot_mat_from_rot_vector(jnp.asarray(v))), want, atol=1e-5
        )
    # zero vector -> identity; homogeneous embeds with [3,3] == 1
    np.testing.assert_array_equal(
        np.asarray(get_rot_mat_from_rot_vector(np.zeros(3, np.float32))), np.eye(3)
    )
    hom = np.asarray(
        get_rot_mat_from_rot_vector(np.array([0.1, 0.2, 0.3], np.float32), True)
    )
    assert hom.shape == (4, 4) and hom[3, 3] == 1.0 and (hom[3, :3] == 0).all()


def test_translation_and_scaling_mats():
    t = np.asarray(get_translation_mat_from_vector(np.array([1.0, 2.0, 3.0])))
    np.testing.assert_array_equal(t[:3, 3], [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(t[:3, :3], np.eye(3))
    s = np.asarray(get_scaling_mat_from_vector(np.array([2.0, 3.0, 4.0])))
    np.testing.assert_array_equal(s, np.diag([2.0, 3.0, 4.0]))
    sh = np.asarray(get_scaling_mat_from_vector(np.array([2.0, 3.0, 4.0]), True))
    np.testing.assert_array_equal(sh, np.diag([2.0, 3.0, 4.0, 1.0]))


def test_apply_matrix_flag_semantics():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((2, 5)).astype(np.float32)  # (D, N)
    mat = np.array([[2.0, 0.0], [0.0, 3.0]], np.float32)
    np.testing.assert_allclose(np.asarray(apply_matrix(pts, mat)), mat @ pts)
    # transposed point set round-trips the layout
    np.testing.assert_allclose(
        np.asarray(apply_matrix(pts.T, mat, to_apply_to_is_transposed=True)),
        (mat @ pts).T,
    )
    # inverted matrix undoes
    np.testing.assert_allclose(
        np.asarray(apply_matrix(apply_matrix(pts, mat), mat, matrix_is_inverted=True)),
        pts,
        atol=1e-5,
    )
    # right-multiplication (dims must compose on the right, as in the
    # reference: numba_operators.py:705-708)
    mat5 = rng.standard_normal((5, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(apply_matrix(pts, mat5, multiply_matrix_from_right=True)),
        pts @ mat5,
        rtol=1e-5,
    )
    # homogeneous: translation via 3x3 on 2-D points
    trans = np.array([[1.0, 0, 10.0], [0, 1.0, -5.0], [0, 0, 1.0]], np.float32)
    np.testing.assert_allclose(
        np.asarray(apply_matrix(pts, trans, in_homog=True)),
        pts + np.array([[10.0], [-5.0]], np.float32),
    )
    # 1-D vector in, 1-D out
    v = np.array([1.0, 2.0], np.float32)
    np.testing.assert_allclose(np.asarray(apply_matrix(v, mat)), mat @ v)


def test_centers_and_radii_from_bboxes():
    boxes = np.array([[0.0, 0.0, 4.0, 10.0], [5.0, 5.0, 1.0, 1.0]], np.float32)
    c = np.asarray(get_center_from_bboxes(boxes))
    np.testing.assert_allclose(c, [[2.0, 5.0], [3.0, 3.0]])
    r = np.asarray(get_radii_from_bboxes(boxes, scaling_factor=1.0))
    # min distance from center to any edge: 2.0 for both boxes
    np.testing.assert_allclose(r, [2.0, 2.0])
    r_scaled = np.asarray(get_radii_from_bboxes(boxes, scaling_factor=0.5))
    np.testing.assert_allclose(r_scaled, [1.0, 1.0])
    # explicit off-center centers clamp at 0
    r_off = np.asarray(
        get_radii_from_bboxes(
            boxes[:1], scaling_factor=1.0, centers=np.array([[0.0, 0.0]], np.float32)
        )
    )
    np.testing.assert_allclose(r_off, [0.0])


def test_apply_transform_to_points_multi_pair_rows():
    # rows hold TWO (x, y) pairs; a pure translation moves both pairs
    pts = np.array([[0.0, 0.0, 1.0, 1.0], [2.0, 3.0, 4.0, 5.0]], np.float32)
    tr = np.array([[1.0, 0, 10.0], [0, 1.0, 20.0]], np.float32)
    out = np.asarray(apply_transform_to_points(pts, tr))
    np.testing.assert_allclose(
        out, pts + np.array([10.0, 20.0, 10.0, 20.0], np.float32)
    )
    # empty input stays empty
    assert np.asarray(
        apply_transform_to_points(np.zeros((0, 2), np.float32), tr)
    ).shape == (0, 2)
    with pytest.raises(ValueError, match="pairs"):
        apply_transform_to_points(np.zeros((2, 3), np.float32), tr)


def test_add_post_transform_composes_left():
    proj = np.array([[100.0, 0, 50, 0], [0, 100.0, 30, 0], [0, 0, 1.0, 0]], np.float32)
    post = np.array([[0.5, 0, 8.0], [0, 0.5, -4.0]], np.float32)
    full = np.asarray(add_post_transform_to_projection_matrix(proj, post))
    # projecting then post-transforming == the composed matrix
    p3d = np.array([2.0, 1.0, 2.0, 1.0], np.float32)
    img = proj @ p3d
    img_xy = img[:2] / img[2]
    want = post @ np.array([img_xy[0], img_xy[1], 1.0], np.float32)
    got = full @ p3d
    np.testing.assert_allclose(got[:2] / got[2], want, rtol=1e-5)


def test_apply_clipping_and_info():
    rects = np.array([[-2.0, -2.0, 4.0, 4.0]], np.float32)  # half off-image
    centers = np.array([[1.0, 1.0]], np.float32)
    ident = np.eye(3, dtype=np.float32)
    rc, cc, hw, frac = apply_clipping_and_get_with_clipping_info(
        rects, centers, ident, [10, 10]
    )
    np.testing.assert_allclose(np.asarray(rc), [[0.0, 0.0, 4.0, 4.0]])
    np.testing.assert_allclose(np.asarray(cc), [[1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(hw), [[4.0, 4.0]])
    np.testing.assert_allclose(np.asarray(frac), [16.0 / 36.0])


def test_get_is_active_rules():
    hw = np.array([[4.0, 4.0], [1.0, 4.0], [4.0, 4.0], [4.0, 4.0]], np.float32)
    classes = np.array([0, 0, 9, 1])
    frac = np.array([1.0, 1.0, 1.0, 0.1], np.float32)
    per_class = np.array([[2.0, 2.0], [2.0, 2.0]], np.float32)
    active = np.asarray(
        get_is_active(hw, classes, frac, None, per_class, num_classes=2,
                      min_fraction_area_thresh=0.5)
    )
    # 0: ok; 1: too small; 2: class out of range; 3: clipped away
    np.testing.assert_array_equal(active, [True, False, False, False])
    # no classes: size rule only
    active2 = np.asarray(
        get_is_active(hw, None, frac, [2.0, 2.0], None, num_classes=2,
                      min_fraction_area_thresh=0.0)
    )
    np.testing.assert_array_equal(active2, [True, False, True, True])


def test_pad_to_common_size():
    a = np.ones((2, 3), np.float32)
    b = np.ones((4, 1), np.float32)
    pa, pb = pad_to_common_size(a, b, fill_value=-1.0)
    assert pa.shape == pb.shape == (4, 3)
    assert (pa[2:] == -1.0).all() and (pb[:, 1:] == -1.0).all()
