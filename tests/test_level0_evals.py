"""Level-0 simple evaluator: differential vs a fresh transcription of the
reference's matcher (e2e_level0.py:201-261) plus pinned edge semantics."""

import numpy as np

from litepi_tpu.evals.level0 import evaluate_predictions_level0


# ------------------------------------------------------------------------ #
# fresh transcription of the reference loop (dict/list form, verbatim       #
# semantics: calculate_iou e2e_level0.py:186-198, matcher :201-247)          #
# ------------------------------------------------------------------------ #


def _calculate_iou(box1, box2):
    x1_i = max(box1[0], box2[0])
    y1_i = max(box1[1], box2[1])
    x2_i = min(box1[2], box2[2])
    y2_i = min(box1[3], box2[3])
    inter_area = max(0, x2_i - x1_i) * max(0, y2_i - y1_i)
    box1_area = (box1[2] - box1[0]) * (box1[3] - box1[1])
    box2_area = (box2[2] - box2[0]) * (box2[3] - box2[1])
    union_area = box1_area + box2_area - inter_area
    return inter_area / union_area if union_area > 0 else 0


def _reference_level0(all_preds, all_gts, num_classes, iou_threshold=0.5):
    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn = np.zeros(num_classes)
    for preds, gts in zip(all_preds, all_gts):
        gt_matched = [False] * len(gts)
        for pred in preds:
            pred_box = pred["bbox"]
            pred_cls = pred["cls_class"]
            best_iou = 0
            best_gt_idx = -1
            for i, (gt_cls, gx1, gy1, gx2, gy2) in enumerate(gts):
                if gt_matched[i]:
                    continue
                iou = _calculate_iou(pred_box, (gx1, gy1, gx2, gy2))
                if iou > best_iou:
                    best_iou = iou
                    best_gt_idx = i
            if best_iou >= iou_threshold and best_gt_idx >= 0:
                gt_cls = gts[best_gt_idx][0]
                gt_matched[best_gt_idx] = True
                if pred_cls == gt_cls:
                    tp[pred_cls] += 1
                else:
                    fp[pred_cls] += 1
                    fn[gt_cls] += 1
            else:
                fp[pred_cls] += 1
        for i, (gt_cls, _, _, _, _) in enumerate(gts):
            if not gt_matched[i]:
                fn[gt_cls] += 1
    precision = np.divide(tp, tp + fp, out=np.zeros_like(tp), where=(tp + fp) != 0)
    recall = np.divide(tp, tp + fn, out=np.zeros_like(tp), where=(tp + fn) != 0)
    f1 = np.divide(
        2 * precision * recall, precision + recall,
        out=np.zeros_like(precision), where=(precision + recall) != 0,
    )
    return precision, recall, f1, tp, fp, fn


def _to_repo_form(all_preds_dicts):
    out = []
    for preds in all_preds_dicts:
        boxes = np.array([p["bbox"] for p in preds], np.float32).reshape(-1, 4)
        scores = np.array([p.get("conf", 0.5) for p in preds], np.float32)
        labels = np.array([p["cls_class"] for p in preds], np.int64)
        out.append((boxes, scores, labels))
    return out


def _to_repo_gts(all_gts_tuples):
    out = []
    for gts in all_gts_tuples:
        boxes = np.array([g[1:] for g in gts], np.float32).reshape(-1, 4)
        cls = np.array([g[0] for g in gts], np.int64)
        out.append((boxes, cls))
    return out


def _assert_matches(all_preds_dicts, all_gts_tuples, num_classes, iou=0.5):
    p, r, f1, tp, fp, fn = _reference_level0(
        all_preds_dicts, all_gts_tuples, num_classes, iou
    )
    got = evaluate_predictions_level0(
        _to_repo_form(all_preds_dicts), _to_repo_gts(all_gts_tuples),
        num_classes, iou,
    )
    np.testing.assert_allclose(got["precision_per_class"], p, atol=1e-12)
    np.testing.assert_allclose(got["recall_per_class"], r, atol=1e-12)
    np.testing.assert_allclose(got["f1_per_class"], f1, atol=1e-12)
    np.testing.assert_array_equal(got["tp"], tp)
    np.testing.assert_array_equal(got["fp"], fp)
    np.testing.assert_array_equal(got["fn"], fn)
    assert got["mean_precision"] == float(np.mean(p))
    assert got["mean_recall"] == float(np.mean(r))
    assert got["mean_f1"] == float(np.mean(f1))


def test_fuzz_differential():
    rng = np.random.default_rng(0)
    nc = 7
    all_preds, all_gts = [], []
    for _ in range(40):
        n_gt = int(rng.integers(0, 6))
        gts = []
        for _ in range(n_gt):
            x1, y1 = rng.integers(0, 200, 2)
            w, h = rng.integers(5, 80, 2)
            gts.append((int(rng.integers(0, nc)), int(x1), int(y1),
                        int(x1 + w), int(y1 + h)))
        n_p = int(rng.integers(0, 8))
        preds = []
        for _ in range(n_p):
            if gts and rng.random() < 0.6:
                # jittered copy of a random GT (often matches)
                g = gts[int(rng.integers(0, len(gts)))]
                j = rng.integers(-10, 10, 4)
                box = (g[1] + j[0], g[2] + j[1], g[3] + j[2], g[4] + j[3])
            else:
                x1, y1 = rng.integers(0, 200, 2)
                w, h = rng.integers(5, 80, 2)
                box = (int(x1), int(y1), int(x1 + w), int(y1 + h))
            preds.append(
                {"bbox": tuple(int(v) for v in box),
                 "cls_class": int(rng.integers(0, nc))}
            )
        all_preds.append(preds)
        all_gts.append(gts)
    _assert_matches(all_preds, all_gts, nc)


def test_class_mismatch_consumes_gt():
    """A matched pair with disagreeing class is FP(pred) + FN(gt) AND the
    GT is consumed — a later correct prediction cannot claim it."""
    gts = [[(1, 10, 10, 50, 50)]]
    preds = [[
        {"bbox": (10, 10, 50, 50), "cls_class": 0},  # wrong class, consumes
        {"bbox": (11, 11, 50, 50), "cls_class": 1},  # right class, too late
    ]]
    got = evaluate_predictions_level0(
        _to_repo_form(preds), _to_repo_gts(gts), 3
    )
    np.testing.assert_array_equal(got["tp"], [0, 0, 0])
    np.testing.assert_array_equal(got["fp"], [1, 1, 0])
    np.testing.assert_array_equal(got["fn"], [0, 1, 0])
    _assert_matches(preds, gts, 3)


def test_pred_order_matters_not_score():
    """Predictions are consumed in list order (the reference never sorts
    by confidence): the first pred takes the best GT even at lower score."""
    gts = [[(0, 0, 0, 40, 40)]]
    preds_a = [[
        {"bbox": (0, 0, 40, 40), "cls_class": 0, "conf": 0.1},
        {"bbox": (1, 1, 40, 40), "cls_class": 0, "conf": 0.9},
    ]]
    got = evaluate_predictions_level0(
        _to_repo_form(preds_a), _to_repo_gts(gts), 1
    )
    np.testing.assert_array_equal(got["tp"], [1])
    np.testing.assert_array_equal(got["fp"], [1])
    _assert_matches(preds_a, gts, 1)


def test_tie_keeps_first_gt():
    """Equal IoU against two GTs: strict > keeps the FIRST (reference loop
    order)."""
    gts = [[(0, 0, 0, 40, 40), (1, 100, 0, 140, 40)]]
    # pred overlapping neither more than the other is impossible with
    # disjoint gts; use two identical gts at the same place instead
    gts = [[(0, 0, 0, 40, 40), (1, 0, 0, 40, 40)]]
    preds = [[{"bbox": (0, 0, 40, 40), "cls_class": 1}]]
    got = evaluate_predictions_level0(
        _to_repo_form(preds), _to_repo_gts(gts), 2
    )
    # first GT (class 0) is taken -> class mismatch -> fp[1] + fn[0]; the
    # second GT stays unmatched -> fn[1]
    np.testing.assert_array_equal(got["tp"], [0, 0])
    np.testing.assert_array_equal(got["fp"], [0, 1])
    np.testing.assert_array_equal(got["fn"], [1, 1])
    _assert_matches(preds, gts, 2)


def test_empty_sides():
    _assert_matches([[]], [[]], 3)
    _assert_matches([[]], [[(0, 0, 0, 10, 10)]], 3)
    _assert_matches([[{"bbox": (0, 0, 10, 10), "cls_class": 2}]], [[]], 3)


def test_iou_exactly_at_threshold_matches():
    """best_iou >= iou_threshold is inclusive."""
    # IoU of [0,0,20,10] vs [0,0,10,10] = 100/200 = 0.5 exactly
    gts = [[(0, 0, 0, 10, 10)]]
    preds = [[{"bbox": (0, 0, 20, 10), "cls_class": 0}]]
    got = evaluate_predictions_level0(
        _to_repo_form(preds), _to_repo_gts(gts), 1, iou_threshold=0.5
    )
    np.testing.assert_array_equal(got["tp"], [1])
    _assert_matches(preds, gts, 1)
