"""The low-conf mAP pass must not clip the PR-curve tail.

The reference NMS sees every candidate above yolo_conf=0.001, unbounded
(e2e.py:240-296).  The mAP pass therefore decodes candidates on device and
runs the exact unbounded numpy NMS on the host (PipelineEvaluator.run_batch
with eval_budget=True); the fixed-shape device NMS (512 candidates / 64
detections) is the serving path only.  These tests pin down (a) that the
device NMS is exact whenever the scene fits its budget, and (b) that dense
scenes really do overflow the serving budget — the reason the eval path
exists.
"""

import numpy as np
import pytest

from litepi_tpu.core.types import NMSConfig
from litepi_tpu.evals.reference import evaluate_predictions_reference
from litepi_tpu.ops.nms import nms_fixed, nms_numpy_reference


def _dense_scene(rng, n_gt=80, n_noise=600):
    """A dense scene: n_gt real signs each with one confident detection,
    plus n_noise low-conf clutter candidates — total > the 512-candidate
    serving budget."""
    cells = int(np.ceil(np.sqrt(n_gt)))
    gx, gy = np.meshgrid(np.arange(cells), np.arange(cells))
    origins = np.stack([gx.ravel(), gy.ravel()], -1)[:n_gt] * 56.0
    gt = np.concatenate([origins, origins + 40.0], -1).astype(np.float32)

    tp_boxes = gt + rng.uniform(-2, 2, gt.shape).astype(np.float32)
    tp_scores = rng.uniform(0.3, 0.9, n_gt).astype(np.float32)

    nx = rng.uniform(0, cells * 56.0, (n_noise, 2)).astype(np.float32)
    nwh = rng.uniform(10, 50, (n_noise, 2)).astype(np.float32)
    noise_boxes = np.concatenate([nx, nx + nwh], -1)
    noise_scores = rng.uniform(0.002, 0.01, n_noise).astype(np.float32)

    boxes = np.concatenate([tp_boxes, noise_boxes])
    scores = np.concatenate([tp_scores, noise_scores])
    scores += np.arange(len(scores))[::-1] * 1e-7  # unique scores
    cls = np.zeros(len(boxes), np.int32)
    return boxes, scores.astype(np.float32), cls, gt


def _metrics(pred_boxes, pred_scores, pred_cls, gt):
    preds = [(pred_boxes, pred_scores, pred_cls.astype(np.int64))]
    gts = [(gt, np.zeros(len(gt), np.int64))]
    return evaluate_predictions_reference(preds, gts, num_classes=1)


def test_device_nms_exact_within_budget():
    """When candidates fit the serving budget, the fixed-shape device NMS
    reproduces the unbounded numpy reference exactly (same survivors in the
    same order)."""
    rng = np.random.default_rng(3)
    boxes, scores, cls, _ = _dense_scene(rng, n_gt=20, n_noise=100)
    keep_idx = nms_numpy_reference(boxes, scores, 0.45)
    assert len(boxes) <= 512 and len(keep_idx) <= 300

    b, s, c, v = (
        np.asarray(x)
        for x in nms_fixed(
            boxes, scores, cls, 0.001, 0.45,
            max_candidates=512, max_detections=300,
        )
    )
    order = np.argsort(-scores[keep_idx])
    np.testing.assert_allclose(b[v], boxes[keep_idx][order], atol=1e-5)
    np.testing.assert_allclose(s[v], scores[keep_idx][order], atol=1e-7)


def test_serving_budget_clips_dense_scene():
    """Documents WHY the eval pass bypasses the device budgets: at 512/64
    the dense scene loses recall (only 64 detection slots for 80 GTs),
    while the unbounded host NMS keeps every TP."""
    rng = np.random.default_rng(7)
    boxes, scores, cls, gt = _dense_scene(rng)
    assert len(boxes) > 512
    nms_cfg = NMSConfig()
    assert nms_cfg.eval_max_candidates == 0  # unbounded by default
    assert nms_cfg.eval_max_detections == 0

    b, s, c, v = (
        np.asarray(x)
        for x in nms_fixed(
            boxes, scores, cls, 0.001, 0.45,
            max_candidates=nms_cfg.max_candidates,
            max_detections=nms_cfg.max_detections,
        )
    )
    clipped = _metrics(b[v], s[v], c[v], gt)

    keep_idx = nms_numpy_reference(boxes, scores, 0.45)
    full = _metrics(boxes[keep_idx], scores[keep_idx], cls[keep_idx], gt)

    assert full["mean_recall"] == pytest.approx(1.0, abs=1e-6)
    assert clipped["mean_recall"] < full["mean_recall"] - 0.1
    assert clipped["mAP50"] < full["mAP50"] - 0.05
