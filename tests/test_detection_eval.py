"""Detection evaluation (models/eval.py) vs independent pure-python oracles.

The device side (batched IoU + scan-based greedy matching) is cross-
validated against a scalar-loop reference implementing the same COCO-style
protocol; the AP computation against a direct max-precision-at-recall loop.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from accvlab_tpu.models.eval import (
    DetectionEvaluator,
    _interpolated_ap,
    box_iou_matrix,
    match_detections,
)
from accvlab_tpu.ragged import RaggedBatch


# --------------------------------------------------------------------------- #
# oracles
# --------------------------------------------------------------------------- #


def iou_scalar(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    area = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1])
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def oracle_match(preds, gts, thr):
    """COCO-style greedy: per (score-sorted) detection, best-IoU *unmatched*
    same-class gt with IoU >= thr; consumes it. preds: [(box, cls)] sorted;
    gts: [(box, cls)]."""
    matched = set()
    tps = []
    for box, cls in preds:
        best, best_iou = -1, -1.0
        for j, (gbox, gcls) in enumerate(gts):
            if j in matched or gcls != cls:
                continue
            i = iou_scalar(box, gbox)
            if i >= thr and i > best_iou:
                best, best_iou = j, i
        if best >= 0:
            matched.add(best)
            tps.append(True)
        else:
            tps.append(False)
    return tps


def oracle_ap(scores, tp, num_gt, num_points=101):
    order = np.argsort(-np.asarray(scores), kind="stable")
    tp = np.asarray(tp, float)[order]
    recalls, precisions = [], []
    c_tp = c_fp = 0.0
    for t in tp:
        c_tp += t
        c_fp += 1.0 - t
        recalls.append(c_tp / num_gt)
        precisions.append(c_tp / (c_tp + c_fp))
    acc = 0.0
    for r in np.linspace(0, 1, num_points):
        ps = [p for p, rr in zip(precisions, recalls) if rr >= r]
        acc += max(ps) if ps else 0.0
    return acc / num_points


def mk_rb(arr, sizes):
    return RaggedBatch(jnp.asarray(arr), sample_sizes=jnp.asarray(sizes, jnp.int32))


# --------------------------------------------------------------------------- #
# IoU
# --------------------------------------------------------------------------- #


def test_iou_matrix_matches_scalar():
    rng = np.random.default_rng(0)
    b1 = rng.uniform(0, 50, (2, 4, 4)).astype(np.float32)
    b2 = rng.uniform(0, 50, (2, 3, 4)).astype(np.float32)
    # make them proper x1<x2, y1<y2 boxes
    for b in (b1, b2):
        b[..., 2:] = b[..., :2] + np.abs(b[..., 2:]) + 0.1
    got = np.asarray(box_iou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
    for bi in range(2):
        for i in range(4):
            for j in range(3):
                np.testing.assert_allclose(
                    got[bi, i, j], iou_scalar(b1[bi, i], b2[bi, j]),
                    rtol=1e-5, atol=1e-6,
                )


def test_iou_degenerate_boxes_zero():
    z = jnp.zeros((1, 1, 4))
    assert float(box_iou_matrix(z, z)[0, 0, 0]) == 0.0


# --------------------------------------------------------------------------- #
# matching
# --------------------------------------------------------------------------- #


def test_match_hand_case_duplicate_and_class():
    # one gt box of class 0; det0 (score high) overlaps it, det1 duplicates
    # (lower score -> FP), det2 same box wrong class -> FP
    box = [10.0, 10.0, 20.0, 20.0]
    pred_boxes = mk_rb([[box, box, box]], [3])
    pred_scores = mk_rb([[0.9, 0.8, 0.7]], [3])
    pred_classes = mk_rb([[0, 0, 1]], [3])
    gt_boxes = mk_rb([[box]], [1])
    gt_classes = mk_rb([[0]], [1])
    tp = np.asarray(
        match_detections(pred_boxes, pred_scores, pred_classes, gt_boxes, gt_classes)
    )
    np.testing.assert_array_equal(tp, [[True, False, False]])


def test_match_consumed_gt_falls_through_to_next_best():
    # det0 takes gtA (best IoU); det1's best is also gtA but it is consumed,
    # so det1 falls through to gtB (COCO protocol)
    gtA = [0.0, 0.0, 10.0, 10.0]
    gtB = [0.0, 0.0, 14.0, 10.0]
    det = [0.0, 0.0, 11.0, 10.0]  # IoU(det,gtA)=10/11 > IoU(det,gtB)=11/14
    pred_boxes = mk_rb([[det, det]], [2])
    pred_scores = mk_rb([[0.9, 0.8]], [2])
    pred_classes = mk_rb([[0, 0]], [2])
    gt_boxes = mk_rb([[gtA, gtB]], [2])
    gt_classes = mk_rb([[0, 0]], [2])
    tp = np.asarray(
        match_detections(pred_boxes, pred_scores, pred_classes, gt_boxes, gt_classes,
                         iou_threshold=0.5)
    )
    np.testing.assert_array_equal(tp, [[True, True]])


def test_match_padded_slots_never_tp():
    box = [0.0, 0.0, 10.0, 10.0]
    pred_boxes = mk_rb([[box, box]], [1])  # slot 1 is padding
    pred_scores = mk_rb([[0.9, 0.9]], [1])
    pred_classes = mk_rb([[0, 0]], [1])
    gt_boxes = mk_rb([[box, box]], [2])
    gt_classes = mk_rb([[0, 0]], [2])
    tp = np.asarray(
        match_detections(pred_boxes, pred_scores, pred_classes, gt_boxes, gt_classes)
    )
    np.testing.assert_array_equal(tp, [[True, False]])


def test_match_empty_gt_or_pred():
    box = [0.0, 0.0, 10.0, 10.0]
    pred_boxes = mk_rb(np.zeros((1, 0, 4), np.float32), [0])
    pred_scores = mk_rb(np.zeros((1, 0), np.float32), [0])
    pred_classes = mk_rb(np.zeros((1, 0), np.int32), [0])
    gt_boxes = mk_rb([[box]], [1])
    gt_classes = mk_rb([[0]], [1])
    tp = match_detections(pred_boxes, pred_scores, pred_classes, gt_boxes, gt_classes)
    assert tp.shape == (1, 0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_match_crossval_random(seed):
    rng = np.random.default_rng(seed)
    b, kmax, mmax, ncls = 3, 8, 6, 3
    psz = rng.integers(0, kmax + 1, b)
    gsz = rng.integers(0, mmax + 1, b)

    def boxes(n_total, shape):
        xy = rng.uniform(0, 30, (*shape, 2))
        wh = rng.uniform(1, 15, (*shape, 2))
        return np.concatenate([xy, xy + wh], -1).astype(np.float32)

    pb = boxes(None, (b, kmax))
    gb = boxes(None, (b, mmax))
    scores = -np.sort(-rng.uniform(0, 1, (b, kmax)).astype(np.float32), axis=1)
    pcls = rng.integers(0, ncls, (b, kmax)).astype(np.int32)
    gcls = rng.integers(0, ncls, (b, mmax)).astype(np.int32)
    thr = float(rng.uniform(0.1, 0.7))

    tp = np.asarray(
        match_detections(
            mk_rb(pb, psz), mk_rb(scores, psz), mk_rb(pcls, psz),
            mk_rb(gb, gsz), mk_rb(gcls, gsz), iou_threshold=thr,
        )
    )
    for bi in range(b):
        preds = [(pb[bi, i], pcls[bi, i]) for i in range(psz[bi])]
        gts = [(gb[bi, j], gcls[bi, j]) for j in range(gsz[bi])]
        expect = oracle_match(preds, gts, thr)
        np.testing.assert_array_equal(tp[bi, : psz[bi]], expect, err_msg=f"sample {bi}")
        assert not tp[bi, psz[bi]:].any()


# --------------------------------------------------------------------------- #
# AP / evaluator
# --------------------------------------------------------------------------- #


def test_ap_hand_case():
    # 2 gts; detections: TP, FP, TP -> recalls .5,.5,1; precisions 1,.5,.667
    scores = np.array([0.9, 0.8, 0.7])
    tp = np.array([1.0, 0.0, 1.0])
    got = _interpolated_ap(scores, tp, num_gt=2)
    want = oracle_ap(scores, tp, 2)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # envelope: precision at recall<=0.5 is 1.0; (0.5,1.0] is 2/3
    assert abs(got - (51 * 1.0 + 50 * (2 / 3)) / 101) < 1e-9


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_crossval_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 40))
    scores = rng.uniform(0, 1, n)
    tp = rng.integers(0, 2, n).astype(float)
    num_gt = int(tp.sum() + rng.integers(0, 5))
    if num_gt == 0:
        num_gt = 1
    np.testing.assert_allclose(
        _interpolated_ap(scores, tp, num_gt), oracle_ap(scores, tp, num_gt), atol=1e-12
    )


def test_evaluator_perfect_predictions():
    box = [5.0, 5.0, 25.0, 30.0]
    box2 = [40.0, 40.0, 60.0, 55.0]
    gt = {
        "boxes": mk_rb([[box, box2]], [2]),
        "classes": mk_rb([[0, 1]], [2]),
    }
    dets = {
        "boxes": mk_rb([[box, box2]], [2]),
        "scores": mk_rb([[0.9, 0.8]], [2]),
        "classes": mk_rb([[0, 1]], [2]),
    }
    ev = DetectionEvaluator(iou_thresholds=(0.5, 0.75))
    ev.update(dets, gt)
    res = ev.compute()
    assert res["mAP@0.5"] == pytest.approx(1.0)
    assert res["mAP@0.75"] == pytest.approx(1.0)
    assert res["mAP"] == pytest.approx(1.0)
    assert res["per_class"][0.5][0] == pytest.approx(1.0)


def test_evaluator_streaming_multiple_batches_and_reset():
    box = [0.0, 0.0, 10.0, 10.0]
    off_box = [100.0, 100.0, 110.0, 110.0]
    gt = {"boxes": mk_rb([[box]], [1]), "classes": mk_rb([[0]], [1])}
    hit = {
        "boxes": mk_rb([[box]], [1]),
        "scores": mk_rb([[0.9]], [1]),
        "classes": mk_rb([[0]], [1]),
    }
    miss = {
        "boxes": mk_rb([[off_box]], [1]),
        "scores": mk_rb([[0.8]], [1]),
        "classes": mk_rb([[0]], [1]),
    }
    ev = DetectionEvaluator()
    ev.update(hit, gt)
    ev.update(miss, gt)
    res = ev.compute()
    # 2 gts total, one TP@0.9 one FP@0.8: recall caps at 0.5 with precision 1
    want = oracle_ap([0.9, 0.8], [1.0, 0.0], 2)
    assert res["mAP@0.5"] == pytest.approx(want)
    ev.reset()
    ev.update(hit, gt)
    assert ev.compute()["mAP@0.5"] == pytest.approx(1.0)


def test_evaluator_class_absent_from_gt_excluded():
    box = [0.0, 0.0, 10.0, 10.0]
    gt = {"boxes": mk_rb([[box]], [1]), "classes": mk_rb([[2]], [1])}
    dets = {  # predicts class 5 which never occurs in gt
        "boxes": mk_rb([[box]], [1]),
        "scores": mk_rb([[0.9]], [1]),
        "classes": mk_rb([[5]], [1]),
    }
    ev = DetectionEvaluator()
    ev.update(dets, gt)
    res = ev.compute()
    assert list(res["per_class"][0.5].keys()) == [2]
    assert res["mAP@0.5"] == pytest.approx(0.0)  # class 2 has no hits


def test_evaluator_composes_with_decode(tmp_path):
    """decode_detections output feeds the evaluator directly (the serving
    contract: sorted scores, RaggedBatch fields)."""
    from accvlab_tpu.models import decode_detections

    b, hf, wf, c = 1, 8, 8, 2
    heat = np.full((b, hf, wf, c), -8.0, np.float32)
    heat[0, 2, 3, 1] = 8.0  # one strong peak
    outputs = {
        "heatmap": jnp.asarray(heat),
        "offset": jnp.zeros((b, hf, wf, 2)),
        "size": jnp.full((b, hf, wf, 2), 2.0),
    }
    dets = decode_detections(outputs, max_detections=4, score_threshold=0.5)
    # gt at the same location: center (3,2)*4, size 8x8 -> matches
    gt_box = [3 * 4 - 4, 2 * 4 - 4, 3 * 4 + 4, 2 * 4 + 4]
    gt = {
        "boxes": mk_rb([[gt_box]], [1]),
        "classes": mk_rb([[1]], [1]),
    }
    ev = DetectionEvaluator(iou_thresholds=(0.5,))
    ev.update(dets, gt)
    assert ev.compute()["mAP@0.5"] == pytest.approx(1.0)


# --------------------------------------------------------------------------- #
# 3-D center-distance matching (nuScenes protocol)
# --------------------------------------------------------------------------- #

from accvlab_tpu.models.eval import match_detections_3d


def oracle_match_3d(preds, gts, thr):
    """Nearest-first greedy: per (score-sorted) detection, the CLOSEST
    unmatched same-class gt STRICTLY within thr meters of BEV center
    distance (the devkit's ``min_dist < dist_th``)."""
    matched = set()
    tps = []
    for box, cls in preds:
        best, best_d = -1, float("inf")
        for j, (gbox, gcls) in enumerate(gts):
            if j in matched or gcls != cls:
                continue
            d = ((box[0] - gbox[0]) ** 2 + (box[1] - gbox[1]) ** 2) ** 0.5
            if d < thr and d < best_d:
                best, best_d = j, d
        if best >= 0:
            matched.add(best)
            tps.append(True)
        else:
            tps.append(False)
    return tps


def _box7(x, y):
    return [x, y, 0.0, 2.0, 4.0, 1.5, 0.0]


def test_match_3d_nearest_first_and_consumption():
    # det0 is 1 m from gtA and 1.5 m from gtB -> takes gtA (nearest);
    # det1 sits on gtA but it is consumed -> falls through to gtB (2.2 m,
    # inside the 4 m gate)
    pred = mk_rb([[_box7(1.0, 0.0), _box7(0.0, 0.0)]], [2])
    scores = mk_rb([[0.9, 0.8]], [2])
    classes = mk_rb([[0, 0]], [2])
    gt = mk_rb([[_box7(0.0, 0.0), _box7(2.2, 0.0)]], [2])
    gt_classes = mk_rb([[0, 0]], [2])
    tp = np.asarray(
        match_detections_3d(pred, scores, classes, gt, gt_classes,
                            distance_threshold=4.0)
    )
    np.testing.assert_array_equal(tp, [[True, True]])
    # tighter gate: the fallthrough gt is out of range
    tp2 = np.asarray(
        match_detections_3d(pred, scores, classes, gt, gt_classes,
                            distance_threshold=2.0)
    )
    np.testing.assert_array_equal(tp2, [[True, False]])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_match_3d_crossval_random(seed):
    rng = np.random.default_rng(100 + seed)
    b, kmax, mmax, ncls = 3, 7, 5, 3
    psz = rng.integers(0, kmax + 1, b)
    gsz = rng.integers(0, mmax + 1, b)
    pb = rng.uniform(-20, 20, (b, kmax, 7)).astype(np.float32)
    gb = rng.uniform(-20, 20, (b, mmax, 7)).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, (b, kmax)).astype(np.float32), axis=1)
    pcls = rng.integers(0, ncls, (b, kmax)).astype(np.int32)
    gcls = rng.integers(0, ncls, (b, mmax)).astype(np.int32)
    thr = float(rng.uniform(2.0, 15.0))
    tp = np.asarray(
        match_detections_3d(
            mk_rb(pb, psz), mk_rb(scores, psz), mk_rb(pcls, psz),
            mk_rb(gb, gsz), mk_rb(gcls, gsz), distance_threshold=thr,
        )
    )
    for bi in range(b):
        preds = [(pb[bi, i], pcls[bi, i]) for i in range(psz[bi])]
        gts = [(gb[bi, j], gcls[bi, j]) for j in range(gsz[bi])]
        expect = oracle_match_3d(preds, gts, thr)
        np.testing.assert_array_equal(tp[bi, : psz[bi]], expect, err_msg=f"sample {bi}")
        assert not tp[bi, psz[bi]:].any()


def test_evaluator_center_distance_with_petr_decode():
    """decode_detections_3d output feeds the center-distance evaluator
    (nuScenes ladder) directly."""
    from accvlab_tpu.models import decode_detections_3d

    b, q, c = 1, 6, 3
    logits = np.full((b, q, c), -4.0, np.float32)
    existence = np.full((b, q), -6.0, np.float32)
    boxes3d = np.zeros((b, q, 7), np.float32)
    # query 2: confident class-1 object at (10, 5)
    logits[0, 2, 1] = 6.0
    existence[0, 2] = 6.0
    boxes3d[0, 2, :2] = (10.0, 5.0)
    outputs = {
        "logits": jnp.asarray(logits),
        "existence": jnp.asarray(existence),
        "boxes3d": jnp.asarray(boxes3d),
    }
    dets = decode_detections_3d(outputs, max_detections=4, score_threshold=0.5)
    gt = {
        "boxes3d": mk_rb([[_box7(10.5, 5.0)]], [1]),  # 0.5 m off
        "classes": mk_rb([[1]], [1]),
    }
    ev = DetectionEvaluator(metric="center_distance", thresholds=(0.5, 1.0, 2.0, 4.0))
    ev.update(dets, gt)
    res = ev.compute()
    # devkit gate is STRICT (dist < thr): exactly 0.5 m off fails the 0.5 m
    # gate and passes the wider ones
    assert res["mAP@0.5"] == pytest.approx(0.0)
    assert res["mAP@1"] == pytest.approx(1.0)
    assert res["mAP@4"] == pytest.approx(1.0)
    assert res["mAP"] == pytest.approx(0.75)
    # out of every gate -> all zero
    gt_far = {
        "boxes3d": mk_rb([[_box7(30.0, 30.0)]], [1]),
        "classes": mk_rb([[1]], [1]),
    }
    ev2 = DetectionEvaluator(metric="center_distance", thresholds=(0.5, 4.0))
    ev2.update(dets, gt_far)
    assert ev2.compute()["mAP"] == pytest.approx(0.0)


def test_evaluator_metric_validation():
    with pytest.raises(ValueError, match="unknown metric"):
        DetectionEvaluator(metric="giou")


def test_ladder_matcher_agrees_with_single_threshold_fns():
    """The evaluator's one-jit threshold-ladder program must agree with the
    public single-threshold matchers at every rung, both metrics."""
    from accvlab_tpu.models.eval import _match_all_thresholds

    rng = np.random.default_rng(7)
    b, kmax, mmax = 2, 6, 5
    psz = rng.integers(1, kmax + 1, b)
    gsz = rng.integers(1, mmax + 1, b)
    pb2 = rng.uniform(0, 30, (b, kmax, 4)).astype(np.float32)
    pb2[..., 2:] = pb2[..., :2] + rng.uniform(1, 10, (b, kmax, 2))
    gb2 = rng.uniform(0, 30, (b, mmax, 4)).astype(np.float32)
    gb2[..., 2:] = gb2[..., :2] + rng.uniform(1, 10, (b, mmax, 2))
    pb3 = rng.uniform(-10, 10, (b, kmax, 7)).astype(np.float32)
    gb3 = rng.uniform(-10, 10, (b, mmax, 7)).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, (b, kmax)).astype(np.float32), axis=1)
    pcls = rng.integers(0, 2, (b, kmax)).astype(np.int32)
    gcls = rng.integers(0, 2, (b, mmax)).astype(np.int32)

    args2 = (mk_rb(pb2, psz), mk_rb(scores, psz), mk_rb(pcls, psz),
             mk_rb(gb2, gsz), mk_rb(gcls, gsz))
    ladder = (0.1, 0.3, 0.5, 0.75)
    all2 = np.asarray(_match_all_thresholds("iou", ladder, *args2))
    for ti, t in enumerate(ladder):
        single = np.asarray(match_detections(*args2, iou_threshold=t))
        np.testing.assert_array_equal(all2[ti], single, err_msg=f"iou@{t}")

    args3 = (mk_rb(pb3, psz), mk_rb(scores, psz), mk_rb(pcls, psz),
             mk_rb(gb3, gsz), mk_rb(gcls, gsz))
    meters = (0.5, 1.0, 2.0, 4.0)
    all3 = np.asarray(_match_all_thresholds("center_distance", meters, *args3))
    for ti, t in enumerate(meters):
        single = np.asarray(match_detections_3d(*args3, distance_threshold=t))
        np.testing.assert_array_equal(all3[ti], single, err_msg=f"dist@{t}")
