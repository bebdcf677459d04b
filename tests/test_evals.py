"""Eval layer: label parsing, matcher and mAP golden cases with
hand-computable answers."""

import numpy as np
import pytest

from litepi_tpu.evals.labels import load_class_names, parse_yolo_label, sample_images
from litepi_tpu.evals.map import (
    IOU_THRESHOLDS,
    evaluate_predictions,
    match_predictions,
)


def test_parse_yolo_label(tmp_path):
    p = tmp_path / "img.txt"
    p.write_text("0 0.5 0.5 0.2 0.4\n1 0.25 0.25 0.1 0.1\n")
    boxes, cls = parse_yolo_label(str(p), img_w=100, img_h=200)
    np.testing.assert_allclose(boxes[0], [40, 60, 60, 140], atol=1e-4)
    np.testing.assert_allclose(boxes[1], [20, 40, 30, 60], atol=1e-4)
    assert cls.tolist() == [0, 1]


def test_parse_missing_label_is_negative_image(tmp_path):
    boxes, cls = parse_yolo_label(str(tmp_path / "nope.txt"), 100, 100)
    assert boxes.shape == (0, 4) and cls.shape == (0,)


def test_load_class_names(tmp_path):
    j = tmp_path / "idx2label.json"
    j.write_text('{"0": "stop", "1": "yield"}')
    assert load_class_names(str(j)) == {0: "stop", 1: "yield"}
    t = tmp_path / "names.txt"
    t.write_text("stop\nyield\n")
    assert load_class_names(str(t)) == {0: "stop", 1: "yield"}
    assert load_class_names(None) is None


def test_sample_images_deterministic(tmp_path):
    for i in range(10):
        (tmp_path / f"img{i:02d}.jpg").write_bytes(b"")
    a = sample_images(str(tmp_path), 5, seed=42)
    b = sample_images(str(tmp_path), 5, seed=42)
    assert a == b and len(a) == 5
    assert sample_images(str(tmp_path), None) == sorted(
        sample_images(str(tmp_path), None)
    )


def test_match_perfect_prediction():
    gt = np.array([[10, 10, 50, 50]], np.float32)
    pred = gt.copy()
    correct = match_predictions(pred, np.zeros(1), gt, np.zeros(1))
    assert correct.all()  # IoU 1.0 passes every threshold


def test_match_wrong_class_never_matches():
    gt = np.array([[10, 10, 50, 50]], np.float32)
    correct = match_predictions(gt.copy(), np.ones(1), gt, np.zeros(1))
    assert not correct.any()


def test_match_unique_assignment():
    """Two predictions on one gt: only the higher-IoU one is a TP."""
    gt = np.array([[0, 0, 100, 100]], np.float32)
    preds = np.array([[0, 0, 100, 100], [0, 0, 90, 100]], np.float32)
    correct = match_predictions(preds, np.zeros(2), gt, np.zeros(1))
    assert correct[0, 0] and not correct[1, 0]


def test_match_iou_threshold_cutoff():
    gt = np.array([[0, 0, 100, 100]], np.float32)
    pred = np.array([[0, 0, 100, 60]], np.float32)  # IoU = 0.6
    correct = match_predictions(pred, np.zeros(1), gt, np.zeros(1))
    want = IOU_THRESHOLDS <= 0.6 + 1e-9
    np.testing.assert_array_equal(correct[0], want)


def test_evaluate_perfect_detector():
    gt = np.array([[10, 10, 50, 50], [100, 100, 200, 200]], np.float32)
    gtc = np.array([0, 0], np.int32)
    preds = [(gt.copy(), np.array([0.9, 0.8], np.float32), gtc.copy())]
    m = evaluate_predictions(preds, [(gt, gtc)], num_classes=1)
    assert m["mAP50"] == pytest.approx(1.0, abs=1e-3)
    assert m["mAP50_95"] == pytest.approx(1.0, abs=1e-3)
    assert m["precision"] == pytest.approx(1.0, abs=1e-3)
    assert m["recall"] == pytest.approx(1.0, abs=1e-3)
    assert m["fp"] == 0 and m["fn"] == 0 and m["tp"] == 2


def test_evaluate_half_recall():
    """One of two gts detected -> AP ~= 0.5 under the *Ultralytics* contract
    (curve closed at recall[-1]+0.01).  The reference-exact evaluator gives
    0.75 here — see tests/test_evals_reference.py::test_half_recall_ap_is_075;
    this test intentionally locks the opt-in Ultralytics semantics."""
    gts = [
        (
            np.array([[10, 10, 50, 50], [100, 100, 200, 200]], np.float32),
            np.array([0, 0], np.int32),
        )
    ]
    preds = [
        (
            np.array([[10, 10, 50, 50]], np.float32),
            np.array([0.9], np.float32),
            np.array([0], np.int32),
        )
    ]
    m = evaluate_predictions(preds, gts, num_classes=1)
    assert m["mAP50"] == pytest.approx(0.5, abs=0.02)
    assert m["recall"] == pytest.approx(0.5, abs=1e-3)
    assert m["precision"] == pytest.approx(1.0, abs=1e-3)


def test_evaluate_false_positive_hurts_precision():
    gts = [
        (np.array([[10, 10, 50, 50]], np.float32), np.array([0], np.int32))
    ]
    preds = [
        (
            np.array([[10, 10, 50, 50], [300, 300, 400, 400]], np.float32),
            np.array([0.8, 0.9], np.float32),  # FP is MORE confident
            np.array([0, 0], np.int32),
        )
    ]
    m = evaluate_predictions(preds, gts, num_classes=1)
    # PR curve: first det (conf .9) is FP -> precision at full recall = 0.5
    assert m["mAP50"] == pytest.approx(0.5, abs=0.02)


def test_evaluate_map_averages_present_classes_only():
    """A class with no gt must not drag the mean down (e2e.py:803-811)."""
    gts = [
        (np.array([[10, 10, 50, 50]], np.float32), np.array([2], np.int32))
    ]
    preds = [
        (
            np.array([[10, 10, 50, 50]], np.float32),
            np.array([0.9], np.float32),
            np.array([2], np.int32),
        )
    ]
    m = evaluate_predictions(preds, gts, num_classes=91)
    assert m["classes_present"] == [2]
    assert m["mAP50"] == pytest.approx(1.0, abs=1e-3)


def test_evaluate_empty_predictions():
    gts = [
        (np.array([[10, 10, 50, 50]], np.float32), np.array([0], np.int32))
    ]
    preds = [
        (
            np.zeros((0, 4), np.float32),
            np.zeros(0, np.float32),
            np.zeros(0, np.int32),
        )
    ]
    m = evaluate_predictions(preds, gts, num_classes=1)
    assert m["mAP50"] == 0.0 and m["recall"] == 0.0
