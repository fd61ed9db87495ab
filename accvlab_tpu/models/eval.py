"""Detection evaluation: batched IoU, greedy matching, mAP.

Closes the loop the reference leaves to external tooling (its examples
defer evaluation to the nuscenes devkit outside the repo): train with
:mod:`~accvlab_tpu.models.centernet`, decode with
:func:`~accvlab_tpu.models.decode_detections`, and score the detections
here — without dynamic shapes ever entering compiled code.

TPU-native split of the work:

* **On device, fixed shapes**: the pairwise IoU matrix
  (:func:`box_iou_matrix`) and the score-ordered greedy TP/FP matching
  (:func:`match_detections`) — the sequential match dependency is one
  ``lax.scan`` over the K detection slots, vmapped over the batch, with
  padding/class constraints expressed as masks. One jitted call per batch.
* **On host, tiny data**: the :class:`DetectionEvaluator` accumulates the
  per-detection ``(score, tp, class)`` triplets (K floats per image, not
  images) and computes AP / mAP at the end — precision/recall curves are
  data-dependent-shape territory, exactly what should NOT be compiled.

The matching protocol is the standard single-match greedy one (VOC/COCO):
detections visit in descending score order; a detection is a true positive
iff its best-IoU *unmatched* ground-truth box of the *same class* clears
the threshold, and it consumes that ground truth. AP uses 101-point
interpolation (COCO style).
"""

from __future__ import annotations

import collections
from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ragged import RaggedBatch


def box_iou_matrix(boxes1, boxes2):
    """Pairwise IoU of two batched ``x1,y1,x2,y2`` box sets.

    Args:
        boxes1: ``(B, N, 4)``; boxes2: ``(B, M, 4)``.

    Returns:
        ``(B, N, M)`` float32 IoU. Degenerate (zero-area) pairs give 0.
    """
    b1 = boxes1[..., :, None, :]  # (B, N, 1, 4)
    b2 = boxes2[..., None, :, :]  # (B, 1, M, 4)
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = jnp.clip(b1[..., 2] - b1[..., 0], 0.0) * jnp.clip(b1[..., 3] - b1[..., 1], 0.0)
    area2 = jnp.clip(b2[..., 2] - b2[..., 0], 0.0) * jnp.clip(b2[..., 3] - b2[..., 1], 0.0)
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def match_detections(
    pred_boxes: RaggedBatch,
    pred_scores: RaggedBatch,
    pred_classes: RaggedBatch,
    gt_boxes: RaggedBatch,
    gt_classes: RaggedBatch,
    iou_threshold: float = 0.5,
):
    """Greedy score-ordered TP/FP assignment, batched and jit-compatible.

    Predictions must be sorted by descending score within each sample —
    :func:`~accvlab_tpu.models.decode_detections` already returns them so
    (``lax.top_k`` order). Ground-truth boxes may be in any order.

    Args:
        pred_boxes/pred_scores/pred_classes: RaggedBatches ``(B, K, 4)`` /
            ``(B, K)`` / ``(B, K)`` — the decode output.
        gt_boxes/gt_classes: RaggedBatches ``(B, M, 4)`` / ``(B, M)``.
        iou_threshold: minimum IoU for a true positive.

    Returns:
        ``tp (B, K) bool`` — per detection slot; padded slots are False.
        Evaluate padded-slot validity via ``pred_scores.mask`` as usual.
    """
    if pred_boxes.tensor.shape[-2] == 0 or gt_boxes.tensor.shape[-2] == 0:
        # no detection slots or no gt slots: nothing can match (and the
        # scan/argmax below cannot trace over a zero-length axis)
        return jnp.zeros(pred_scores.tensor.shape, bool)
    iou = box_iou_matrix(pred_boxes.tensor, gt_boxes.tensor)  # (B, K, M)
    eligible = _eligibility(pred_scores, pred_classes, gt_classes) & (
        iou >= iou_threshold
    )
    return _greedy_match(jnp.where(eligible, iou, -jnp.inf))


def match_detections_3d(
    pred_boxes3d: RaggedBatch,
    pred_scores: RaggedBatch,
    pred_classes: RaggedBatch,
    gt_boxes3d: RaggedBatch,
    gt_classes: RaggedBatch,
    distance_threshold: float = 2.0,
):
    """nuScenes-style 3-D matching: greedy over score order, a detection is
    a TP iff the NEAREST unmatched same-class ground truth lies within
    ``distance_threshold`` meters of **BEV center distance** (the nuScenes
    devkit protocol — its mAP ladder is 0.5/1/2/4 m and its gate is STRICT,
    ``dist < threshold``; yaw and size affect the devkit's TP-error
    metrics, not the matching).

    Boxes are ``(B, K, 7)`` with ``x, y`` leading (``x,y,z,w,l,h,yaw``);
    only ``[..., :2]`` participates. Returns ``tp (B, K) bool``.
    """
    if pred_boxes3d.tensor.shape[-2] == 0 or gt_boxes3d.tensor.shape[-2] == 0:
        return jnp.zeros(pred_scores.tensor.shape, bool)
    d = (
        pred_boxes3d.tensor[..., :, None, :2] - gt_boxes3d.tensor[..., None, :, :2]
    )
    dist2 = jnp.sum(d * d, axis=-1)  # (B, K, M)
    eligible = _eligibility(pred_scores, pred_classes, gt_classes) & (
        dist2 < float(distance_threshold) ** 2
    )
    # nearest-first: affinity is negative squared distance
    return _greedy_match(jnp.where(eligible, -dist2, -jnp.inf))


def _eligibility(pred_scores, pred_classes, gt_classes):
    same_class = (
        pred_classes.tensor[..., :, None] == gt_classes.tensor[..., None, :]
    )
    return (
        same_class
        & gt_classes.mask[..., None, :]
        & pred_scores.mask[..., :, None]
    )


def _greedy_match(cand):
    """Greedy assignment over score-sorted detection slots: ``cand (B,K,M)``
    holds the affinity of eligible pairs and ``-inf`` elsewhere; each slot
    takes its best-affinity unmatched gt (consuming it) or is a FP."""

    def match_one(cand_km):
        def step(matched, cand_m):
            avail = jnp.where(matched, -jnp.inf, cand_m)
            best = jnp.argmax(avail)
            ok = avail[best] > -jnp.inf
            matched = matched.at[best].set(matched[best] | ok)
            return matched, ok

        m0 = jnp.zeros((cand_km.shape[1],), bool)
        _, tp = jax.lax.scan(step, m0, cand_km)
        return tp

    return jax.vmap(match_one)(cand)


def _match_all_thresholds(metric, thresholds, pb, ps, pc, gb, gc):
    """One traced program for the WHOLE threshold ladder: the (B, K, M)
    affinity matrix and eligibility mask are computed once and each
    threshold only re-gates them (the evaluator's per-batch device call —
    10x cheaper than one program per threshold on the COCO 0.5:0.95
    ladder, and one host sync instead of T)."""
    t_shape = (len(thresholds),) + ps.tensor.shape
    if pb.tensor.shape[-2] == 0 or gb.tensor.shape[-2] == 0:
        return jnp.zeros(t_shape, bool)
    elig = _eligibility(ps, pc, gc)
    if metric == "iou":
        aff = box_iou_matrix(pb.tensor, gb.tensor)
        gates = [aff >= t for t in thresholds]
    else:
        d = pb.tensor[..., :, None, :2] - gb.tensor[..., None, :, :2]
        dist2 = jnp.sum(d * d, axis=-1)
        aff = -dist2
        gates = [dist2 < t * t for t in thresholds]
    return jnp.stack(
        [_greedy_match(jnp.where(elig & g, aff, -jnp.inf)) for g in gates]
    )


def _interpolated_ap(scores, tp, num_gt, num_points=101):
    """COCO-style AP: precision envelope sampled at evenly spaced recalls."""
    if num_gt == 0:
        return float("nan")  # class absent from ground truth -> excluded
    if scores.size == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tp[order].astype(np.float64)
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1.0 - tp)
    recall = cum_tp / num_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
    # precision envelope (monotone non-increasing from the right)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    sample_recalls = np.linspace(0.0, 1.0, num_points)
    idx = np.searchsorted(recall, sample_recalls, side="left")
    sampled = np.where(idx < precision.size, precision[np.minimum(idx, precision.size - 1)], 0.0)
    return float(sampled.mean())


class DetectionEvaluator:
    """Streaming mAP over batches of decoded detections.

    ``update()`` runs the jitted device matching and stores only the tiny
    per-detection host triplets; ``compute()`` builds AP per class and the
    mean. One evaluator instance per IoU threshold set.

    Example::

        ev = DetectionEvaluator(iou_thresholds=(0.5, 0.75))
        for batch in val_pipeline:
            dets = decode_detections(model.apply(params, batch["images"]))
            ev.update(dets, batch["gt"])   # gt: {"boxes": RB, "classes": RB}
        print(ev.compute())                # {"mAP@0.5": ..., "per_class": ...}
    """

    def __init__(
        self,
        iou_thresholds: Sequence[float] = (0.5,),
        num_points: int = 101,
        *,
        metric: str = "iou",
        thresholds: Optional[Sequence[float]] = None,
    ):
        """Args:
            iou_thresholds: IoU ladder for ``metric="iou"``.
            metric: ``"iou"`` (2-D boxes, :func:`match_detections`) or
                ``"center_distance"`` (3-D boxes under the nuScenes
                protocol, :func:`match_detections_3d`; thresholds are
                METERS — the devkit ladder is ``(0.5, 1, 2, 4)``).
            thresholds: metric-agnostic alias; overrides ``iou_thresholds``.
        """
        if metric not in ("iou", "center_distance"):
            raise ValueError(f"unknown metric {metric!r}")
        ts = thresholds if thresholds is not None else iou_thresholds
        self._metric = metric
        self._box_field = "boxes" if metric == "iou" else "boxes3d"
        self._thresholds = tuple(float(t) for t in ts)
        self._num_points = int(num_points)
        # per threshold: list of (scores, tp, classes) arrays
        self._records = {t: [] for t in self._thresholds}
        self._gt_counts: collections.Counter = collections.Counter()
        self._matcher = jax.jit(
            lambda pb, ps, pc, gb, gc: _match_all_thresholds(
                self._metric, self._thresholds, pb, ps, pc, gb, gc
            )
        )

    def update(self, detections: Dict[str, RaggedBatch], ground_truth: Dict[str, RaggedBatch]):
        """Accumulate one batch.

        Args:
            detections: ``{"boxes"|"boxes3d", "scores", "classes"}``
                RaggedBatches as returned by :func:`decode_detections` /
                :func:`decode_detections_3d` (score-sorted).
            ground_truth: ``{"boxes"|"boxes3d", "classes"}`` RaggedBatches.
        """
        bf = self._box_field
        pb, ps, pc = detections[bf], detections["scores"], detections["classes"]
        gb, gc = ground_truth[bf], ground_truth["classes"]
        pred_valid = np.asarray(ps.mask)
        scores = np.asarray(ps.tensor)
        classes = np.asarray(pc.tensor)
        gt_classes = np.asarray(gc.tensor)
        gt_valid = np.asarray(gc.mask)
        for c, n in zip(*np.unique(gt_classes[gt_valid], return_counts=True)):
            self._gt_counts[int(c)] += int(n)
        tp_all = np.asarray(self._matcher(pb, ps, pc, gb, gc))  # (T, B, K)
        v = pred_valid.reshape(-1)
        for ti, t in enumerate(self._thresholds):
            self._records[t].append(
                (
                    scores.reshape(-1)[v],
                    tp_all[ti].reshape(-1)[v],
                    classes.reshape(-1)[v],
                )
            )

    def compute(self) -> Dict[str, object]:
        """AP per class and threshold; ``mAP@t`` means over present classes;
        ``mAP`` the mean over thresholds (COCO-style when thresholds are
        the 0.5:0.95 ladder)."""
        out: Dict[str, object] = {"per_class": {}}
        maps = []
        classes_present = sorted(self._gt_counts)
        for t in self._thresholds:
            recs = self._records[t]
            if recs:
                scores = np.concatenate([r[0] for r in recs])
                tp = np.concatenate([r[1] for r in recs])
                cls = np.concatenate([r[2] for r in recs])
            else:
                scores = tp = cls = np.zeros((0,))
            aps = {}
            for c in classes_present:
                sel = cls == c
                aps[c] = _interpolated_ap(
                    scores[sel], tp[sel], self._gt_counts[c], self._num_points
                )
            vals = [a for a in aps.values() if not np.isnan(a)]
            m = float(np.mean(vals)) if vals else float("nan")
            out["per_class"][t] = aps
            out[f"mAP@{t:g}"] = m
            maps.append(m)
        vals = [m for m in maps if not np.isnan(m)]
        out["mAP"] = float(np.mean(vals)) if vals else float("nan")
        return out

    def reset(self):
        self._records = {t: [] for t in self._thresholds}
        self._gt_counts.clear()
