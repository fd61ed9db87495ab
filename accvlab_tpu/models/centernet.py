"""CenterNet-style detector + masked ragged loss (flagship training target).

The model exists to exercise the full framework end to end on TPU — the
pipeline produces (images, heatmap targets, ragged box targets); the loss
uses :mod:`accvlab_tpu.ragged`'s masked gather/reduction ops exactly like the
reference's batched StreamPETR loss computation
(``packages/batching_helpers/example/``; SURVEY §3.5).

Design is TPU-first: bf16 conv backbone (MXU-friendly NHWC convs), penalty-
reduced focal loss on dense heatmaps, L1 offset/size losses masked via
RaggedBatch existence weights. Sharding: batch over the ``data`` mesh axis,
head channels over ``model`` (see ``make_train_step``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn
import optax

from ..ragged import RaggedBatch, average_over_targets, batched_indexing_access


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, dtype=jnp.bfloat16)(x)
        x = nn.GroupNorm(num_groups=8, dtype=jnp.float32)(x)
        return nn.relu(x)


class CenterNetDetector(nn.Module):
    """Small multi-camera CenterNet: conv backbone (stride 4) + 3 heads.

    Input ``(B, H, W, 3)`` float; outputs heatmap logits ``(B, H/4, W/4, C)``,
    offsets ``(B, H/4, W/4, 2)``, sizes ``(B, H/4, W/4, 2)``.
    """

    num_classes: int = 10
    width: int = 64

    @nn.compact
    def __call__(self, images):
        x = images.astype(jnp.bfloat16)
        x = ConvBlock(self.width, stride=2)(x)
        x = ConvBlock(self.width, stride=1)(x)
        x = ConvBlock(self.width * 2, stride=2)(x)
        x = ConvBlock(self.width * 2, stride=1)(x)
        x = ConvBlock(self.width * 2, stride=1)(x)
        feat = x.astype(jnp.float32)
        heat = nn.Conv(self.num_classes, (1, 1), name="head_heatmap")(feat)
        offset = nn.Conv(2, (1, 1), name="head_offset")(feat)
        size = nn.Conv(2, (1, 1), name="head_size")(feat)
        return {"heatmap": heat, "offset": offset, "size": size}


def focal_loss(pred_logits, target_heatmap, alpha=2.0, beta=4.0):
    """Penalty-reduced pixel-wise focal loss (CenterNet eq. 1)."""
    pred = jax.nn.sigmoid(pred_logits)
    pred = jnp.clip(pred, 1e-6, 1.0 - 1e-6)
    pos = target_heatmap >= 0.999
    pos_loss = -jnp.log(pred) * (1.0 - pred) ** alpha
    neg_loss = -jnp.log(1.0 - pred) * pred**alpha * (1.0 - target_heatmap) ** beta
    loss = jnp.where(pos, pos_loss, neg_loss)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return jnp.sum(loss) / num_pos


def centernet_loss(outputs: Dict[str, Any], targets: Dict[str, Any]) -> Dict[str, Any]:
    """Full detection loss.

    ``targets``: ``heatmap (B, Hf, Wf, C)``; ``centers`` RaggedBatch
    ``(B, T, 2)`` int (x, y in feature coords); ``offsets`` RaggedBatch
    ``(B, T, 2)``; ``sizes`` RaggedBatch ``(B, T, 2)`` as **(w, h)** in
    feature coords (CenterNet's convention, and what
    :func:`decode_detections` assumes of the trained size head — the
    pipeline's ``hw`` annotation is (h, w), flip it when building targets).

    The per-object terms gather head outputs at the (ragged) center
    locations with :func:`batched_indexing_access` and reduce with
    :func:`average_over_targets` — the reference's batched-loss pattern.
    """
    heat_loss = focal_loss(outputs["heatmap"], targets["heatmap"])

    centers: RaggedBatch = targets["centers"]
    b = outputs["offset"].shape[0]
    wf = outputs["offset"].shape[2]
    flat_idx = centers.tensor[..., 1] * wf + centers.tensor[..., 0]  # (B, T)
    idx = centers.create_with_sample_sizes_like_self(flat_idx.astype(jnp.int32))

    def gather_per_object(head):  # (B, Hf, Wf, 2) -> RaggedBatch (B, T, 2)
        flat = head.reshape(b, -1, head.shape[-1])
        return batched_indexing_access(flat, idx)

    pred_offset = gather_per_object(outputs["offset"])
    pred_size = gather_per_object(outputs["size"])

    def l1(pred_rb: RaggedBatch, tgt_rb: RaggedBatch):
        diff = pred_rb.apply(lambda t: jnp.abs(t - tgt_rb.tensor))
        return jnp.mean(average_over_targets(diff))

    offset_loss = l1(pred_offset, targets["offsets"])
    size_loss = l1(pred_size, targets["sizes"])
    total = heat_loss + offset_loss + 0.1 * size_loss
    return {
        "loss": total,
        "heatmap_loss": heat_loss,
        "offset_loss": offset_loss,
        "size_loss": size_loss,
    }


def decode_detections(
    outputs: Dict[str, Any],
    max_detections: int = 100,
    score_threshold: float = 0.1,
    stride: int = 4,
) -> Dict[str, Any]:
    """NMS-free CenterNet inference decode (serving path).

    TPU-native: peaks are local maxima of the sigmoid heatmap (3x3 max-pool
    equality — the standard CenterNet trick that replaces NMS, which would be
    a dynamic-shape op), followed by a static per-sample ``top_k`` over all
    (pixel, class) scores. Everything is fixed-shape and jit-compatible; the
    variable number of detections per image is expressed as RaggedBatch
    sample sizes (scores are sorted, so valid detections form a prefix).

    Args:
        outputs: the model's ``{"heatmap", "offset", "size"}`` (logits).
        max_detections: static per-image detection bound (top-K).
        score_threshold: detections below this score pad the batch.
        stride: feature-to-input coordinate scale.

    Returns:
        dict with RaggedBatch ``boxes (B, K, 4)`` as x1,y1,x2,y2 in input
        coords, ``scores (B, K)``, ``classes (B, K)`` int32.
    """
    heat = jax.nn.sigmoid(outputs["heatmap"])  # (B, Hf, Wf, C)
    b, hf, wf, c = heat.shape
    k = min(max_detections, hf * wf * c)

    # peak mask: score equals its 3x3 neighborhood max
    pooled = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    peaks = jnp.where(heat == pooled, heat, 0.0)

    flat = peaks.reshape(b, hf * wf * c)
    scores, flat_idx = jax.lax.top_k(flat, k)  # (B, K) sorted desc
    classes = (flat_idx % c).astype(jnp.int32)
    pix = flat_idx // c
    ys = (pix // wf).astype(jnp.float32)
    xs = (pix % wf).astype(jnp.float32)

    pix_i = pix.astype(jnp.int32)
    off = outputs["offset"].reshape(b, hf * wf, 2)
    sz = outputs["size"].reshape(b, hf * wf, 2)
    off_k = jnp.take_along_axis(off, pix_i[:, :, None], axis=1)  # (B, K, 2)
    sz_k = jnp.take_along_axis(sz, pix_i[:, :, None], axis=1)

    cx = (xs + off_k[:, :, 0]) * stride
    cy = (ys + off_k[:, :, 1]) * stride
    w = sz_k[:, :, 0] * stride
    h = sz_k[:, :, 1] * stride
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)

    num_valid = jnp.sum(scores > score_threshold, axis=1).astype(jnp.int32)
    return {
        "boxes": RaggedBatch(boxes, sample_sizes=num_valid),
        "scores": RaggedBatch(scores, sample_sizes=num_valid),
        "classes": RaggedBatch(classes, sample_sizes=num_valid),
    }


def make_train_step(
    model: CenterNetDetector,
    optimizer: Optional[optax.GradientTransformation] = None,
):
    """Build ``(init_fn, train_step)``.

    ``train_step(params, opt_state, batch, key)`` returns
    ``(params, opt_state, metrics)`` and is jit/pjit-compatible (batch
    leaves and RaggedBatch pytrees shard over the ``data`` axis).
    """
    optimizer = optimizer or optax.adam(1e-3)

    def init_fn(key, example_images):
        params = model.init(key, example_images)
        return params, optimizer.init(params)

    def train_step(params, opt_state, batch, key=None):
        del key

        def loss_fn(p):
            outputs = model.apply(p, batch["images"])
            losses = centernet_loss(outputs, batch["targets"])
            return losses["loss"], losses

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, metrics

    return init_fn, train_step


def make_example_batch(batch_size=2, hw=(64, 96), num_classes=10, max_targets=8, seed=0):
    """Tiny synthetic batch matching the pipeline's output contract."""
    rng = np.random.default_rng(seed)
    hf, wf = hw[0] // 4, hw[1] // 4
    images = rng.uniform(0, 1, (batch_size, *hw, 3)).astype(np.float32)
    sizes = rng.integers(1, max_targets + 1, (batch_size,)).astype(np.int32)
    centers = np.stack(
        [rng.integers(0, wf, (batch_size, max_targets)),
         rng.integers(0, hf, (batch_size, max_targets))],
        axis=-1,
    ).astype(np.int32)
    heatmap = np.zeros((batch_size, hf, wf, num_classes), np.float32)
    for b in range(batch_size):
        for t in range(sizes[b]):
            c = rng.integers(0, num_classes)
            heatmap[b, centers[b, t, 1], centers[b, t, 0], c] = 1.0
    mk = lambda x: RaggedBatch(jnp.asarray(x), sample_sizes=jnp.asarray(sizes))
    return {
        "images": jnp.asarray(images),
        "targets": {
            "heatmap": jnp.asarray(heatmap),
            "centers": mk(centers),
            "offsets": mk(rng.uniform(0, 1, (batch_size, max_targets, 2)).astype(np.float32)),
            "sizes": mk(rng.uniform(1, 8, (batch_size, max_targets, 2)).astype(np.float32)),
        },
    }
