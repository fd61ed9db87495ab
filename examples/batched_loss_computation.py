"""Batched ragged detection-loss computation + batched-vs-per-sample benchmark.

Parity: the reference's canonical batching_helpers workflow
(``packages/batching_helpers/example/`` — Matcher + LossComputation; SURVEY
§3.5) and its headline evaluation: batched loss computation is **x4.46**
faster than the per-sample loop on A100 at batch 8
(``batching_helpers/docs/evaluation.rst:183-227``).

The TPU-native version: cost matrices and all loss terms run as ONE jitted
batched program over RaggedBatch pytrees; only the Hungarian assignment runs
per sample on the host (as in the reference). The per-sample baseline jits
one sample's loss and loops.

Run:  python examples/batched_loss_computation.py        (TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from accvlab_tpu.ragged import (
    RaggedBatch,
    average_over_targets,
    batched_indexing_access,
    batched_indexing_write,
    combine_data,
    get_mask_from_indices,
)


# --------------------------------------------------------------------- #
# Matcher (cost matrices batched on device, assignment per sample on host)
# --------------------------------------------------------------------- #


def iou_cost(rects_gt, rects_pred):
    """(B, Tg, 4) x (B, Tp, 4) -> (B, Tp, Tg) negative-IoU cost."""
    gt = rects_gt[:, None, :, :]  # (B, 1, Tg, 4)
    pr = rects_pred[:, :, None, :]  # (B, Tp, 1, 4)
    x1 = jnp.maximum(gt[..., 0], pr[..., 0])
    y1 = jnp.maximum(gt[..., 1], pr[..., 1])
    x2 = jnp.minimum(gt[..., 2], pr[..., 2])
    y2 = jnp.minimum(gt[..., 3], pr[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_g = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    area_p = (pr[..., 2] - pr[..., 0]) * (pr[..., 3] - pr[..., 1])
    iou = inter / jnp.maximum(area_g + area_p - inter, 1e-6)
    return -iou


def class_cost(classes_gt, class_logits_pred):
    """(B, Tg) int x (B, Tp, C) -> (B, Tp, Tg): negative predicted prob of
    the GT label."""
    probs = jax.nn.softmax(class_logits_pred, axis=-1)  # (B, Tp, C)
    return -jnp.take_along_axis(
        probs[:, :, :], classes_gt.astype(jnp.int32)[:, None, :], axis=2
    )


@jax.jit
def compute_cost_matrices(rects_gt: RaggedBatch, classes_gt: RaggedBatch, rects_pred, logits_pred):
    total = iou_cost(rects_gt.tensor, rects_pred) + class_cost(
        classes_gt.tensor, logits_pred
    )
    # non-uniform along dim 2 (GT objects) — same wrapping as the reference
    return classes_gt.create_with_sample_sizes_like_self(total, non_uniform_dim=2)


def match(rects_gt, classes_gt, rects_pred, logits_pred):
    cost = compute_cost_matrices(rects_gt, classes_gt, rects_pred, logits_pred)
    per_sample = cost.cpu().split()  # crops the padding per sample
    gt_idx, pred_idx = [], []
    for mat in per_sample:
        m_pred, m_gt = linear_sum_assignment(np.asarray(mat))
        gt_idx.append(np.asarray(m_gt, np.int32))
        pred_idx.append(np.asarray(m_pred, np.int32))
    matches_gt = combine_data(gt_idx)
    matches_pred = combine_data(pred_idx, other_with_same_sample_sizes=matches_gt)
    return matches_gt, matches_pred


# --------------------------------------------------------------------- #
# Loss (fully batched, one jitted program)                              #
# --------------------------------------------------------------------- #


@jax.jit
def batched_loss(
    bboxes_gt: RaggedBatch,
    classes_gt: RaggedBatch,
    bboxes_pred,
    logits_pred,
    existence_logits_pred,
    weights_gt: RaggedBatch,
    matches_gt: RaggedBatch,
    matches_pred: RaggedBatch,
):
    cls_gt_m = batched_indexing_access(classes_gt, matches_gt)
    cls_pred_m = batched_indexing_access(logits_pred, matches_pred)
    bbx_gt_m = batched_indexing_access(bboxes_gt, matches_gt)
    bbx_pred_m = batched_indexing_access(bboxes_pred, matches_pred)
    w_m = batched_indexing_access(weights_gt, matches_gt)

    # per-object losses on the padded tensors (plain batched ops)
    ce = -jax.nn.log_softmax(cls_pred_m.tensor, axis=-1)
    cls_loss_data = (
        jnp.take_along_axis(ce, cls_gt_m.tensor.astype(jnp.int32)[..., None], axis=-1)[
            ..., 0
        ]
        * w_m.tensor
    )
    bbox_loss_data = jnp.abs(bbx_gt_m.tensor - bbx_pred_m.tensor).sum(-1) * w_m.tensor

    cls_loss = cls_gt_m.create_with_sample_sizes_like_self(cls_loss_data)
    bbox_loss = bbx_gt_m.create_with_sample_sizes_like_self(bbox_loss_data)

    # existence: matched slots are positives (reference: existence weights
    # written at matched prediction indices)
    existence_target = get_mask_from_indices(
        existence_logits_pred.shape[1], matches_pred
    ).astype(jnp.float32)
    ex_p = jax.nn.sigmoid(existence_logits_pred)
    ex_loss = -(
        existence_target * jnp.log(ex_p + 1e-8)
        + (1 - existence_target) * jnp.log(1 - ex_p + 1e-8)
    ).mean()

    return (
        jnp.mean(average_over_targets(cls_loss))
        + jnp.mean(average_over_targets(bbox_loss))
        + ex_loss
    )


# --------------------------------------------------------------------- #
# Per-sample baseline (the reference's comparison point)                #
# --------------------------------------------------------------------- #


@jax.jit
def one_sample_loss(bb_gt, cls_gt, bb_pred, logits, ex_logits, w, m_gt, m_pred):
    cls_gt_m = cls_gt[m_gt]
    bb_gt_m = bb_gt[m_gt]
    bb_pred_m = bb_pred[m_pred]
    logits_m = logits[m_pred]
    w_m = w[m_gt]
    ce = -jax.nn.log_softmax(logits_m, axis=-1)
    cls_loss = (jnp.take_along_axis(ce, cls_gt_m.astype(jnp.int32)[:, None], 1)[:, 0] * w_m).mean()
    bb_loss = (jnp.abs(bb_gt_m - bb_pred_m).sum(-1) * w_m).mean()
    tgt = jnp.zeros(ex_logits.shape[0]).at[m_pred].set(1.0)
    ex_p = jax.nn.sigmoid(ex_logits)
    ex_loss = -(tgt * jnp.log(ex_p + 1e-8) + (1 - tgt) * jnp.log(1 - ex_p + 1e-8)).mean()
    return cls_loss + bb_loss + ex_loss


def per_sample_loss_loop(data, matches_gt, matches_pred):
    sizes = np.asarray(matches_gt.sample_sizes)
    totals = []
    for i in range(data["bboxes_gt"].tensor.shape[0]):
        n = int(sizes[i])
        totals.append(
            one_sample_loss(
                data["bboxes_gt"].tensor[i],
                data["classes_gt"].tensor[i],
                data["bboxes_pred"][i],
                data["logits_pred"][i],
                data["existence_pred"][i],
                data["weights_gt"].tensor[i],
                matches_gt.tensor[i, :n],
                matches_pred.tensor[i, :n],
            )
        )
    return jnp.mean(jnp.stack(totals))


# --------------------------------------------------------------------- #


def make_data(batch_size=8, max_gt=48, num_pred=300, num_classes=10, seed=0):
    rng = np.random.default_rng(seed)
    # sizes quantized to a few buckets: the per-sample baseline jit-compiles
    # one program per distinct size (the cost SURVEY §5.7 warns about)
    sizes = rng.choice([16, 32, 48], size=(batch_size,)).astype(np.int32)
    mk = lambda x: RaggedBatch(jnp.asarray(x), sample_sizes=jnp.asarray(sizes))
    xy = rng.uniform(0, 500, (batch_size, max_gt, 2))
    wh = rng.uniform(20, 120, (batch_size, max_gt, 2))
    bboxes_gt = np.concatenate([xy, xy + wh], axis=2).astype(np.float32)
    xy_p = rng.uniform(0, 500, (batch_size, num_pred, 2))
    wh_p = rng.uniform(20, 120, (batch_size, num_pred, 2))
    return {
        "bboxes_gt": mk(bboxes_gt),
        "classes_gt": mk(rng.integers(0, num_classes, (batch_size, max_gt)).astype(np.float32)),
        "weights_gt": mk(rng.uniform(0.5, 1.5, (batch_size, max_gt)).astype(np.float32)),
        "bboxes_pred": jnp.asarray(np.concatenate([xy_p, xy_p + wh_p], 2).astype(np.float32)),
        "logits_pred": jnp.asarray(rng.normal(size=(batch_size, num_pred, num_classes)).astype(np.float32)),
        "existence_pred": jnp.asarray(rng.normal(size=(batch_size, num_pred)).astype(np.float32)),
    }


def main():
    print("devices:", jax.devices())
    data = make_data()
    matches_gt, matches_pred = match(
        data["bboxes_gt"], data["classes_gt"], data["bboxes_pred"], data["logits_pred"]
    )

    args = (
        data["bboxes_gt"], data["classes_gt"], data["bboxes_pred"],
        data["logits_pred"], data["existence_pred"], data["weights_gt"],
        matches_gt, matches_pred,
    )
    batched_val = float(batched_loss(*args))
    loop_val = float(per_sample_loss_loop(data, matches_gt, matches_pred))
    print(f"batched loss {batched_val:.4f} | per-sample loop {loop_val:.4f}")

    def timeit(f, n=50):
        jax.block_until_ready(f())
        for _ in range(3):
            jax.block_until_ready(f())
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    t_batched = timeit(lambda: batched_loss(*args))
    t_loop = timeit(lambda: per_sample_loss_loop(data, matches_gt, matches_pred), n=10)
    print(
        f"batched: {t_batched:.3f} ms | per-sample loop: {t_loop:.3f} ms | "
        f"speedup x{t_loop / t_batched:.2f}  (reference on A100: x4.46)"
    )



# --------------------------------------------------------------------- #
# Full training iteration (reference evaluation.rst:190-193: x1.24)     #
# --------------------------------------------------------------------- #


def _head_init(key, dim=256, num_classes=10):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "wb": jax.random.normal(k1, (dim, 4)) * 0.02,
        "wc": jax.random.normal(k2, (dim, num_classes)) * 0.02,
        "we": jax.random.normal(k3, (dim,)) * 0.02,
    }


def _head_forward(params, feat):
    """(.., num_pred, dim) features -> boxes / class logits / existence."""
    return feat @ params["wb"], feat @ params["wc"], feat @ params["we"]


def full_iteration_comparison(batch_size=8, num_pred=300, dim=256, lr=1e-3):
    """Forward + loss + grad + SGD update: one fused batched program vs a
    per-sample gradient loop (the reference's full-training-iteration
    comparison, x1.24 on A100)."""
    rng = np.random.default_rng(1)
    data = make_data(batch_size=batch_size, num_pred=num_pred)
    matches_gt, matches_pred = match(
        data["bboxes_gt"], data["classes_gt"], data["bboxes_pred"], data["logits_pred"]
    )
    feat = jnp.asarray(rng.normal(size=(batch_size, num_pred, dim)).astype(np.float32))
    params = _head_init(jax.random.PRNGKey(0))

    @jax.jit
    def batched_step(params, feat, bboxes_gt, classes_gt, weights_gt, m_gt, m_pred):
        def loss_fn(p):
            boxes, logits, ex = _head_forward(p, feat)
            return batched_loss(
                bboxes_gt, classes_gt, boxes, logits, ex, weights_gt, m_gt, m_pred
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return jax.tree_util.tree_map(lambda a, g: a - lr * g, params, grads), loss

    @jax.jit
    def one_sample_grad(params, feat_i, bb_gt, cls_gt, w, m_gt, m_pred):
        def loss_fn(p):
            boxes, logits, ex = _head_forward(p, feat_i)
            return one_sample_loss(bb_gt, cls_gt, boxes, logits, ex, w, m_gt, m_pred)

        return jax.value_and_grad(loss_fn)(params)

    sizes = np.asarray(matches_gt.sample_sizes)

    def per_sample_step(params):
        acc = None
        total = 0.0
        for i in range(batch_size):
            n = int(sizes[i])
            loss, grads = one_sample_grad(
                params,
                feat[i],
                data["bboxes_gt"].tensor[i],
                data["classes_gt"].tensor[i],
                data["weights_gt"].tensor[i],
                matches_gt.tensor[i, :n],
                matches_pred.tensor[i, :n],
            )
            total = total + loss
            acc = grads if acc is None else jax.tree_util.tree_map(jnp.add, acc, grads)
        return (
            jax.tree_util.tree_map(lambda a, g: a - lr * g / batch_size, params, acc),
            total / batch_size,
        )

    args = (
        feat, data["bboxes_gt"], data["classes_gt"], data["weights_gt"],
        matches_gt, matches_pred,
    )

    def timeit(f, n=30):
        jax.block_until_ready(f()[1])
        for _ in range(3):
            jax.block_until_ready(f()[1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = f()
        jax.block_until_ready(out[1])
        return (time.perf_counter() - t0) / n * 1e3

    t_b = timeit(lambda: batched_step(params, *args))
    t_l = timeit(lambda: per_sample_step(params), n=10)
    print(
        f"full iteration — batched: {t_b:.3f} ms | per-sample loop: {t_l:.3f} ms | "
        f"speedup x{t_l / t_b:.2f}  (reference on A100: x1.24)"
    )


def device_matching_comparison():
    """Device-side auction matching vs the host scipy loop (the reference
    runs Hungarian per sample on the host — SURVEY §3.5)."""
    from accvlab_tpu.ragged import batched_auction_matching

    data = make_data()
    cost_cls = class_cost(data["classes_gt"], data["logits_pred"])
    cost_iou = iou_cost(data["bboxes_gt"], data["bboxes_pred"])
    cost = jnp.asarray(cost_cls + cost_iou)
    if cost.shape[1] > cost.shape[2]:  # orient as (B, num_gt, num_pred)
        cost = jnp.swapaxes(cost, 1, 2)
    nv = data["classes_gt"].sample_sizes

    fn = jax.jit(batched_auction_matching)
    mg, mp = fn(cost, nv)
    jax.block_until_ready(mp.tensor)

    from scipy.optimize import linear_sum_assignment

    worst = 0.0
    cost_np = np.asarray(cost)
    for b in range(cost_np.shape[0]):
        n = int(np.asarray(nv)[b])
        sel = np.asarray(mp.tensor)[b, :n]
        my = cost_np[b][np.arange(n), sel].sum()
        ri, ci = linear_sum_assignment(cost_np[b][:n])
        opt = cost_np[b][ri, ci].sum()
        worst = max(worst, (my - opt) / max(abs(opt), 1e-6))

    t0 = time.perf_counter()
    for _ in range(30):
        r = fn(cost, nv)
    jax.block_until_ready(r[1].tensor)
    td = (time.perf_counter() - t0) / 30 * 1e3
    print(
        f"device matching: {td:.2f} ms on-device, worst gap to Hungarian "
        f"{worst*100:.4f}% (optimal). Slower than the host scipy loop in raw "
        f"latency — its value is eliminating the per-step device->host->device "
        f"sync (which bubbles the pipeline and serializes chips at pod scale); "
        f"use it when the train step must stay fully on-device."
    )


if __name__ == "__main__":
    main()
    full_iteration_comparison()
    device_matching_comparison()
