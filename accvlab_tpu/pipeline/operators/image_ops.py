"""Image resampling operators.

``warp_affine`` is the TPU-native equivalent of DALI's ``fn.warp_affine``
(used by the reference AffineTransformer at ``affine_transformer.py:960``):
inverse-mapped bilinear resampling with a fill value. Implemented as pure
jnp/numpy gathers + lerps — under the pipeline's fused device program this
compiles to XLA gathers that pipeline well on TPU (per-pixel work is
element-wise; the batch dimension comes from ``vmap``).
"""

from __future__ import annotations

import numpy as np

from .ops import _xp


def _invert_2x3(matrix, xp):
    a, b, tx = matrix[0, 0], matrix[0, 1], matrix[0, 2]
    c, d, ty = matrix[1, 0], matrix[1, 1], matrix[1, 2]
    det = a * d - b * c
    inv_det = 1.0 / det
    ia, ib = d * inv_det, -b * inv_det
    ic, id_ = -c * inv_det, a * inv_det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return xp.stack(
        [xp.stack([ia, ib, itx]), xp.stack([ic, id_, ity])]
    )


def warp_affine(
    image,
    matrix,
    out_hw,
    fill_value: float = 0.0,
    inverse_map: bool = False,
):
    """Affine-warp an (H, W[, C]) image to ``out_hw`` with bilinear sampling.

    Args:
        image: source image, ``(H, W)`` or ``(H, W, C)``; any real dtype.
        matrix: ``(2, 3)`` affine transform. With ``inverse_map=False`` (the
            DALI default used by the reference) it maps source -> destination
            coordinates; the inverse is applied for sampling.
        out_hw: output ``(height, width)``.
        fill_value: value for samples outside the source image.

    Sampling uses pixel-center coordinates with (0, 0) at the center of the
    top-left pixel (matching the reference's point/image consistency:
    ``apply_transform_to_points`` uses the same coordinate frame).
    """
    xp = _xp(image) if _xp(image) is not np else _xp(matrix)
    src = xp.asarray(image)
    orig_dtype = src.dtype
    img = src.astype(np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])

    m = xp.asarray(matrix, dtype=np.float32)
    if not inverse_map:
        m = _invert_2x3(m, xp)

    ys = xp.arange(oh, dtype=np.float32)[:, None]
    xs = xp.arange(ow, dtype=np.float32)[None, :]
    src_x = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    src_y = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]

    x0 = xp.floor(src_x)
    y0 = xp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0i = x0.astype(np.int32)
    y0i = y0.astype(np.int32)

    def sample(yi, xi):
        yc = xp.clip(yi, 0, h - 1)
        xc = xp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    wx_ = wx[..., None]
    wy_ = wy[..., None]
    interp = (
        v00 * (1 - wx_) * (1 - wy_)
        + v01 * wx_ * (1 - wy_)
        + v10 * (1 - wx_) * wy_
        + v11 * wx_ * wy_
    )

    valid = (src_x >= 0) & (src_x <= w - 1) & (src_y >= 0) & (src_y <= h - 1)
    out = xp.where(valid[..., None], interp, np.float32(fill_value))
    if np.issubdtype(orig_dtype, np.integer):
        info = np.iinfo(orig_dtype)
        out = xp.clip(xp.round(out), info.min, info.max)
    out = out.astype(orig_dtype)
    return out[..., 0] if squeeze else out
