"""Differential + golden tests for the reference-exact evaluator.

The oracle below is a literal transcription of the reference evaluator's
semantics (/root/reference/src/tt100k/pipeline/e2e.py:656-824) on its own
dict/list interface — every numerical step (IoU eps 1e-7, AP curve closed at
recall 1.0, np.unique-based match dedup, per-class best-F1 operating point,
present-class mAP means) follows that code path exactly so that
``litepi_tpu.evals.reference`` can be checked against it on randomized
inputs to 1e-9.
"""

import numpy as np
import pytest

from litepi_tpu.evals.reference import (
    IOU_THRESHOLDS,
    compute_ap_reference,
    evaluate_predictions_reference,
    match_predictions_reference,
)

# --------------------------------------------------------------------- #
# oracle: reference e2e.py:656-824 semantics, transcribed
# --------------------------------------------------------------------- #


def _oracle(all_preds, all_gts, num_classes, iou_thresholds=IOU_THRESHOLDS):
    """preds: per image list of {'bbox','conf','cls_class'};
    gts: per image list of [cls, x1, y1, x2, y2]."""

    def box_iou(box1, box2):
        def area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        lt = np.maximum(box1[:, None, :2], box2[:, :2])
        rb = np.minimum(box1[:, None, 2:], box2[:, 2:])
        wh = (rb - lt).clip(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (area(box1)[:, None] + area(box2) - inter + 1e-7)

    def compute_ap(recall, precision):
        mrec = np.concatenate(([0.0], recall, [1.0]))
        mpre = np.concatenate(([1.0], precision, [0.0]))
        mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
        x = np.linspace(0, 1, 101)
        return np.trapezoid(np.interp(x, mrec, mpre), x)

    stats = []
    for preds, gts in zip(all_preds, all_gts):
        if len(preds) == 0:
            if len(gts) > 0:
                stats.append(
                    (
                        np.zeros((0, len(iou_thresholds)), dtype=bool),
                        np.array([]),
                        np.array([]),
                        np.array(gts)[:, 0],
                    )
                )
            continue
        pred_bboxes = np.array([p["bbox"] for p in preds])
        pred_conf = np.array([p["conf"] for p in preds])
        pred_cls = np.array([p["cls_class"] for p in preds])
        if len(gts) > 0:
            gts_arr = np.array(gts)
            target_cls, target_bboxes = gts_arr[:, 0], gts_arr[:, 1:]
        else:
            target_cls = np.array([])
            target_bboxes = np.array([])
        correct = np.zeros((len(preds), len(iou_thresholds)), dtype=bool)
        if len(gts) > 0:
            iou_matrix = box_iou(pred_bboxes, target_bboxes)
            for i, thr in enumerate(iou_thresholds):
                x = np.where(iou_matrix >= thr)
                if x[0].shape[0]:
                    matches = np.concatenate(
                        (np.stack(x, 1), iou_matrix[x[0], x[1]][:, None]), 1
                    )
                    if x[0].shape[0] > 1:
                        matches = matches[matches[:, 2].argsort()[::-1]]
                        matches = matches[
                            np.unique(matches[:, 0], return_index=True)[1]
                        ]
                        matches = matches[
                            np.unique(matches[:, 1], return_index=True)[1]
                        ]
                    for (pi, gi, _) in matches:
                        if pred_cls[int(pi)] == target_cls[int(gi)]:
                            correct[int(pi), i] = True
        stats.append((correct, pred_conf, pred_cls, target_cls))

    if not stats:
        return None

    tp_all = np.concatenate([s[0] for s in stats], 0)
    conf_all = np.concatenate([s[1] for s in stats], 0)
    pred_cls_all = np.concatenate([s[2] for s in stats], 0)
    target_cls_all = np.concatenate([s[3] for s in stats], 0)

    i = np.argsort(-conf_all)
    tp_all, conf_all, pred_cls_all = tp_all[i], conf_all[i], pred_cls_all[i]

    unique_classes, nt = np.unique(target_cls_all, return_counts=True)
    nt_dict = dict(zip(unique_classes, nt))

    ap50 = np.zeros(num_classes)
    ap50_95 = np.zeros(num_classes)
    p_best = np.zeros(num_classes)
    r_best = np.zeros(num_classes)
    f1_best = np.zeros(num_classes)
    tp_count = np.zeros(num_classes)
    fp_count = np.zeros(num_classes)
    fn_count = np.zeros(num_classes)

    for c in range(num_classes):
        n_gt = nt_dict.get(c, 0)
        i_cls = pred_cls_all == c
        n_p = i_cls.sum()
        if n_p == 0 and n_gt == 0:
            continue
        if n_p == 0 or n_gt == 0:
            fn_count[c] = n_gt
            continue
        tpc = tp_all[i_cls].cumsum(0)
        fpc = (1 - tp_all[i_cls]).cumsum(0)
        rec = tpc / (n_gt + 1e-16)
        prec = tpc / (tpc + fpc + 1e-16)
        ap_per_iou = [
            compute_ap(rec[:, j], prec[:, j]) for j in range(tp_all.shape[1])
        ]
        ap50[c] = ap_per_iou[0]
        ap50_95[c] = np.mean(ap_per_iou)
        f1_curve = 2 * prec[:, 0] * rec[:, 0] / (prec[:, 0] + rec[:, 0] + 1e-16)
        bi = np.argmax(f1_curve)
        p_best[c], r_best[c], f1_best[c] = prec[bi, 0], rec[bi, 0], f1_curve[bi]
        tp_count[c] = tpc[bi, 0]
        fp_count[c] = fpc[bi, 0]
        fn_count[c] = n_gt - tp_count[c]

    present = unique_classes.astype(int)
    mAP50 = np.mean(ap50[present]) if len(present) else 0.0
    mAP50_95 = np.mean(ap50_95[present]) if len(present) else 0.0
    return {
        "precision": p_best, "recall": r_best, "f1": f1_best,
        "tp": tp_count, "fp": fp_count, "fn": fn_count,
        "mAP50": mAP50, "mAP50_95": mAP50_95, "ap50_per_class": ap50,
        "classes_present": np.isin(np.arange(num_classes), unique_classes),
    }


def _to_tuple_interface(all_preds_dicts, all_gts_lists):
    preds, gts = [], []
    for pd in all_preds_dicts:
        if pd:
            preds.append(
                (
                    np.array([p["bbox"] for p in pd], np.float64),
                    np.array([p["conf"] for p in pd], np.float64),
                    np.array([p["cls_class"] for p in pd], np.float64),
                )
            )
        else:
            preds.append(
                (np.zeros((0, 4)), np.zeros(0), np.zeros(0))
            )
    for gl in all_gts_lists:
        if gl:
            arr = np.array(gl, np.float64)
            gts.append((arr[:, 1:], arr[:, 0]))
        else:
            gts.append((np.zeros((0, 4)), np.zeros(0)))
    return preds, gts


def _random_case(rng, num_classes=3, num_images=6):
    """Random scenes with heavy pred/GT overlap: perturbed copies, class
    flips, spurious boxes, empty images."""
    all_preds, all_gts = [], []
    for _ in range(num_images):
        gts = []
        for _ in range(rng.integers(0, 5)):
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(8, 40, 2)
            gts.append([rng.integers(0, num_classes), x, y, x + w, y + h])
        preds = []
        for g in gts:
            if rng.random() < 0.8:  # detection of this GT, jittered
                jitter = rng.uniform(-6, 6, 4)
                cls = (
                    g[0]
                    if rng.random() < 0.8
                    else rng.integers(0, num_classes)
                )
                x1, y1, x2, y2 = np.array(g[1:]) + jitter
                preds.append(
                    {
                        "bbox": [x1, y1, max(x2, x1 + 1), max(y2, y1 + 1)],
                        "conf": float(rng.uniform(0.05, 1.0)),
                        "cls_class": int(cls),
                    }
                )
        for _ in range(rng.integers(0, 3)):  # spurious FPs
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(8, 40, 2)
            preds.append(
                {
                    "bbox": [x, y, x + w, y + h],
                    "conf": float(rng.uniform(0.05, 1.0)),
                    "cls_class": int(rng.integers(0, num_classes)),
                }
            )
        all_preds.append(preds)
        all_gts.append(gts)
    return all_preds, all_gts


@pytest.mark.parametrize("seed", range(20))
def test_differential_vs_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    all_preds_d, all_gts_l = _random_case(rng)
    want = _oracle(all_preds_d, all_gts_l, num_classes=3)
    preds, gts = _to_tuple_interface(all_preds_d, all_gts_l)
    got = evaluate_predictions_reference(preds, gts, num_classes=3)
    if want is None:
        assert got["mAP50"] == 0.0
        return
    for key in ("precision", "recall", "f1", "tp", "fp", "fn",
                "ap50_per_class"):
        np.testing.assert_allclose(got[key], want[key], atol=1e-9, err_msg=key)
    assert got["mAP50"] == pytest.approx(want["mAP50"], abs=1e-9)
    assert got["mAP50_95"] == pytest.approx(want["mAP50_95"], abs=1e-9)
    np.testing.assert_array_equal(
        got["classes_present"], want["classes_present"]
    )


def test_half_recall_ap_is_075():
    """One of two GTs found at precision 1: the reference bridges the PR
    curve to recall 1.0, so AP = 0.5*1 + 0.5*0.5 = 0.75 (NOT the
    Ultralytics ~0.505 sentinel value)."""
    gts = [(np.array([[10, 10, 50, 50], [100, 100, 200, 200]], float),
            np.array([0.0, 0.0]))]
    preds = [(np.array([[10, 10, 50, 50]], float), np.array([0.9]),
              np.array([0.0]))]
    m = evaluate_predictions_reference(preds, gts, num_classes=1)
    assert m["mAP50"] == pytest.approx(0.75, abs=1e-6)
    assert m["recall"][0] == pytest.approx(0.5, abs=1e-6)
    assert m["precision"][0] == pytest.approx(1.0, abs=1e-6)


def test_ap_linear_bridge_exact():
    # recall [0.5], precision [1.0]: envelope flat 1.0 to r=0.5 then linear
    # to 0 at r=1.0 -> area 0.75
    assert compute_ap_reference(
        np.array([0.5]), np.array([1.0])
    ) == pytest.approx(0.75, abs=1e-9)


def test_wrong_class_match_consumes_gt():
    """Class-agnostic assignment: a higher-IoU wrong-class pred takes the GT
    (and is then rejected by the class check), leaving the lower-IoU
    right-class pred unmatched at high thresholds (e2e.py:714-726)."""
    gt = np.array([[0.0, 0.0, 100.0, 100.0]])
    gt_cls = np.array([0.0])
    preds = np.array([[0.0, 0.0, 100.0, 100.0],   # wrong class, IoU 1.0
                      [0.0, 0.0, 100.0, 80.0]])   # right class, IoU 0.8
    pred_cls = np.array([1.0, 0.0])
    correct = match_predictions_reference(preds, pred_cls, gt, gt_cls)
    # at thresholds <= 0.8 the pairs are (p0,g0,1.0) and (p1,g0,0.8);
    # gt-dedup keeps the lowest-pred-index pair (p0), which fails the class
    # check -> NOTHING matches, even though p1 alone would have.
    assert not correct.any()


def test_unique_dedup_keeps_lowest_pred_index():
    """The np.unique reorder quirk: gt-dedup keeps the lowest-prediction-
    index pair, not the highest-IoU one (module docstring)."""
    gts = np.array([[0.0, 0.0, 100.0, 100.0], [200.0, 0.0, 300.0, 100.0]])
    gt_cls = np.zeros(2)
    # p0: IoU 0.6 with g0 only; p1: IoU 0.9 with g0 (and none with g1)
    preds = np.array([[0.0, 0.0, 100.0, 60.0], [0.0, 0.0, 100.0, 90.0]])
    pred_cls = np.zeros(2)
    correct = match_predictions_reference(preds, pred_cls, gts, gt_cls)
    # at IoU 0.5: pairs (p0,g0,.6),(p1,g0,.9) -> pred-dedup keeps both,
    # reordered [p0, p1]; gt-dedup first occurrence of g0 is p0's pair.
    assert correct[0, 0] and not correct[1, 0]


def test_empty_everything():
    m = evaluate_predictions_reference([], [], num_classes=2)
    assert m["mAP50"] == 0.0 and not m["classes_present"].any()


def test_perfect_detector_reference():
    gt = np.array([[10, 10, 50, 50], [100, 100, 200, 200]], float)
    gtc = np.array([0.0, 0.0])
    preds = [(gt.copy(), np.array([0.9, 0.8]), gtc.copy())]
    m = evaluate_predictions_reference(preds, [(gt, gtc)], num_classes=1)
    # the reference's curve closure appends (recall 1.0, precision 0), so a
    # perfect detector scores 0.995, not 1.0: the final 0.01-wide trapezoid
    # averages precision 1 -> 0.  Reference-faithful, verified vs the oracle.
    assert m["mAP50"] == pytest.approx(0.995, abs=1e-6)
    assert m["mean_precision"] == pytest.approx(1.0, abs=1e-6)
    assert m["mean_recall"] == pytest.approx(1.0, abs=1e-6)
    assert int(m["tp"][0]) == 2 and int(m["fp"][0]) == 0
