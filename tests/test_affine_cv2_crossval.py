"""Cross-validate warp_affine against OpenCV (independent oracle).

The reference's test strategy validates decoders against an OpenCV CPU
reference with a per-pixel tolerance (``on_demand_video_decoder/tests/
utils.py:7-42``); this applies the same pattern to the affine image warp:
``warp_affine`` and ``cv2.warpAffine`` share the convention (the 2x3
matrix maps source -> destination, sampling via the inverse; pixel centers
at integer coordinates; bilinear; constant border), so interior pixels must
agree within interpolation rounding (cv2 uses 5-bit fixed-point bilinear
weights -> a few LSB on uint8).

Border handling differs legitimately (cv2 blends the constant border INTO
edge pixels' bilinear taps in the same fixed-point grid), so pixels whose
source sample falls within one pixel of the source border are excluded
from the comparison; their count is asserted small.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from accvlab_tpu.pipeline.operators.image_ops import warp_affine


def _random_matrix(rng, hw):
    h, w = hw
    ang = rng.uniform(-60, 60) * np.pi / 180
    scale = rng.uniform(0.6, 1.5)
    shear = rng.uniform(-0.2, 0.2)
    ca, sa = np.cos(ang) * scale, np.sin(ang) * scale
    lin = np.array([[ca, -sa + shear], [sa, ca]], np.float32)
    # rotate about the image center, then a mild translation
    c = np.array([(w - 1) / 2, (h - 1) / 2], np.float32)
    t = c - lin @ c + rng.uniform(-8, 8, 2).astype(np.float32)
    return np.concatenate([lin, t[:, None]], axis=1).astype(np.float32)


def _interior_mask(m_fwd, out_hw, src_hw):
    """Destination pixels whose source sample is >=1px inside the source."""
    inv = cv2.invertAffineTransform(m_fwd)
    ys, xs = np.mgrid[0 : out_hw[0], 0 : out_hw[1]].astype(np.float32)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    h, w = src_hw
    return (sx >= 1) & (sx <= w - 2) & (sy >= 1) & (sy <= h - 2)


@pytest.mark.parametrize("seed", range(6))
def test_warp_matches_opencv_interior(seed):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(24, 64)), int(rng.integers(24, 64))
    oh, ow = int(rng.integers(24, 64)), int(rng.integers(24, 64))
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    m = _random_matrix(rng, (h, w))

    ours = np.asarray(warp_affine(img, m, (oh, ow))).astype(np.float32)
    ref = cv2.warpAffine(
        img, m, (ow, oh), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    ).astype(np.float32)

    mask = _interior_mask(m, (oh, ow), (h, w))
    assert mask.mean() > 0.2, "degenerate geometry: too few interior pixels"
    diff = np.abs(ours - ref)[mask]
    # 5-bit fixed-point bilinear in cv2 vs float32 here: a few LSB
    assert np.percentile(diff, 99) <= 2.0, float(np.percentile(diff, 99))
    assert diff.max() <= 6.0, float(diff.max())


def test_inverse_map_matches_opencv():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (40, 56), np.uint8)
    m = _random_matrix(rng, (40, 56))
    inv = cv2.invertAffineTransform(m)

    ours = np.asarray(warp_affine(img, inv, (40, 56), inverse_map=True)).astype(
        np.float32
    )
    ref = cv2.warpAffine(
        img, inv, (56, 40),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    ).astype(np.float32)
    mask = _interior_mask(m, (40, 56), (40, 56))
    diff = np.abs(ours - ref)[mask]
    assert np.percentile(diff, 99) <= 2.0


def test_identity_and_pure_translation_are_exact():
    """No interpolation in play: our warp must agree with cv2 EXACTLY."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    shift = np.array([[1, 0, 5], [0, 1, -3]], np.float32)
    for m in (ident, shift):
        ours = np.asarray(warp_affine(img, m, (32, 48)))
        ref = cv2.warpAffine(img, m, (48, 32), flags=cv2.INTER_NEAREST)
        mask = _interior_mask(m, (32, 48), (32, 48))
        np.testing.assert_array_equal(
            ours.astype(np.int16)[mask], ref.astype(np.int16)[mask]
        )


def test_points_and_image_share_the_frame():
    """A source-pixel landmark transformed by apply_transform_to_points
    lands on the same landmark in the warped image (the reference's
    point/image consistency contract)."""
    from accvlab_tpu.pipeline.operators.point_ops import apply_transform_to_points

    img = np.zeros((64, 64), np.uint8)
    img[30, 20] = 255  # landmark at (x=20, y=30)
    rng = np.random.default_rng(3)
    m = _random_matrix(rng, (64, 64))
    warped = np.asarray(warp_affine(img, m, (64, 64)))
    pt = np.asarray(apply_transform_to_points(np.array([[20.0, 30.0]]), m))[0]
    if not (2 <= pt[0] <= 61 and 2 <= pt[1] <= 61):
        pytest.skip("landmark mapped outside the view for this seed")
    # the warped image's mass sits at the transformed point (bilinear
    # spreads it over <=2px)
    yy, xx = np.nonzero(warped > 16)
    assert len(xx) > 0
    cx = (warped[yy, xx] * xx).sum() / warped[yy, xx].sum()
    cy = (warped[yy, xx] * yy).sum() / warped[yy, xx].sum()
    assert abs(cx - pt[0]) < 1.0 and abs(cy - pt[1]) < 1.0, (cx, cy, pt)
