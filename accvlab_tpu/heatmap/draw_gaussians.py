"""Per-sample Gaussian splatting with float radii (pipeline variant).

Parity: the reference's custom DALI CPU operator ``draw_gaussians``
(``dali_pipeline_framework/ext_impl/DrawGaussians.cc:32-160``):

* drawing box per target: ``floor(c - r) .. ceil(c + r)`` (inclusive),
  clipped to the image;
* ``sigma = radius * radius_to_sigma_factor``;
  ``val = k[class] * exp(-(dy^2 + dx^2) / (2 sigma^2))``;
* max-combine with the existing heatmap; inactive targets skipped.

Vectorized masked max-reduce (deterministic, fuses under vmap/jit in the
pipeline's device program).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def draw_gaussians(
    heatmap,
    active,
    slice_ids,
    centers,
    radii,
    k_for_classes: Sequence[float],
    radius_to_sigma_factor: float,
):
    """Draw one sample's Gaussians into a (C, H, W) (or (H, W)) heatmap.

    Args:
        heatmap: ``(C, H, W)`` or ``(H, W)`` float32.
        active: ``(T,)`` bool.
        slice_ids: ``(T,)`` int32 class/channel per target.
        centers: ``(T, 2)`` int32 — x, y full-pixel centers.
        radii: ``(T,)`` float32.
        k_for_classes: per-class peak scale.
        radius_to_sigma_factor: ``sigma = radius * factor``.
    """
    import jax

    xp = (
        __import__("jax.numpy", fromlist=["numpy"])
        if isinstance(heatmap, (jax.Array, jax.core.Tracer))
        else np
    )
    heatmap = xp.asarray(heatmap, dtype=np.float32)
    squeeze = heatmap.ndim == 2
    if squeeze:
        heatmap = heatmap[None]
    c, h, w = heatmap.shape
    active = xp.asarray(active).astype(bool)
    slice_ids = xp.asarray(slice_ids).astype(np.int32)
    centers = xp.asarray(centers).astype(np.int32)
    radii = xp.asarray(radii).astype(np.float32)
    k = xp.asarray(np.asarray(k_for_classes, np.float32))

    rows = xp.arange(h, dtype=np.int32)[None, :, None]  # (1, H, 1)
    cols = xp.arange(w, dtype=np.int32)[None, None, :]  # (1, 1, W)
    cx = centers[:, 0][:, None, None]
    cy = centers[:, 1][:, None, None]
    dy = rows - cy
    dx = cols - cx
    reach = xp.ceil(radii).astype(np.int32)[:, None, None]
    inbox = (xp.abs(dy) <= reach) & (xp.abs(dx) <= reach) & active[:, None, None]
    sigma = radii * radius_to_sigma_factor
    inv = 1.0 / xp.maximum(2.0 * sigma * sigma, np.float32(1e-12))
    safe_ids = xp.clip(slice_ids, 0, max(c - 1, 0))
    val = k[safe_ids][:, None, None] * xp.exp(
        -(dy * dy + dx * dx).astype(np.float32) * inv[:, None, None]
    )
    contrib = xp.where(inbox, val, -np.inf)  # (T, H, W)
    if xp is np:
        chan_match = safe_ids[:, None] == np.arange(c, dtype=np.int32)[None, :]
        contrib_c = np.where(chan_match[:, :, None, None], contrib[:, None], -np.inf)
        drawn = np.max(contrib_c, axis=0, initial=-np.inf)
    else:
        # scatter-max per channel: O(T*H*W) instead of O(T*C*H*W), and XLA
        # scatter-max is deterministic on TPU (same guarantee the reference
        # gets from atomicMax being order-independent)
        import jax

        drawn = jax.ops.segment_max(
            contrib, safe_ids, num_segments=c, indices_are_sorted=False
        )  # (C, H, W); empty channels -> -inf
    out = xp.maximum(heatmap, drawn)
    return out[0] if squeeze else out
