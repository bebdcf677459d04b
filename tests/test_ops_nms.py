"""NMS: fixed-shape device kernel vs the exact greedy numpy oracle.

The oracle reproduces the reference's algorithm contract (e2e.py:89-119):
greedy suppression in descending score order with eps 1e-6.  The device kernel
must select the same boxes in the same order for any input where scores are
distinct (ties depend on sort stability, which the reference itself leaves to
``np.argsort`` internals).
"""

import numpy as np
import pytest

from litepi_tpu.ops.nms import nms_fixed, nms_numpy_reference


def _random_dets(rng, n, num_classes=1, scale=640.0):
    x1 = rng.uniform(0, scale * 0.8, n)
    y1 = rng.uniform(0, scale * 0.8, n)
    w = rng.uniform(4, scale * 0.3, n)
    h = rng.uniform(4, scale * 0.3, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)
    # distinct scores so greedy order is unambiguous
    scores = rng.permutation(np.linspace(0.01, 0.99, n)).astype(np.float32)
    cls = rng.integers(0, num_classes, n).astype(np.int32)
    return boxes, scores, cls


def _oracle_per_class(boxes, scores, cls, conf, iou_thr):
    """Per-class greedy NMS as the reference dispatches it (e2e.py:280-296)."""
    mask = scores > conf
    idx = np.nonzero(mask)[0]
    kept = []
    for c in np.unique(cls[idx]):
        sel = idx[cls[idx] == c]
        k = nms_numpy_reference(boxes[sel], scores[sel], iou_thr)
        kept.extend(sel[k].tolist())
    kept.sort(key=lambda i: -scores[i])
    return kept


@pytest.mark.parametrize("num_classes", [1, 3])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_oracle(seed, num_classes):
    rng = np.random.default_rng(seed)
    boxes, scores, cls = _random_dets(rng, 200, num_classes)
    conf, iou_thr = 0.25, 0.45

    expected = _oracle_per_class(boxes, scores, cls, conf, iou_thr)

    out_boxes, out_scores, out_cls, valid = map(
        np.asarray,
        nms_fixed(boxes, scores, cls, conf, iou_thr, 256, 64),
    )
    got = int(valid.sum())
    assert got == min(len(expected), 64)
    exp = expected[:got]
    np.testing.assert_allclose(out_scores[:got], scores[exp], atol=1e-6)
    np.testing.assert_allclose(out_boxes[:got], boxes[exp], atol=1e-4)
    np.testing.assert_array_equal(out_cls[:got], cls[exp])
    # padding contract
    assert np.all(out_scores[got:] == 0.0)
    assert np.all(out_cls[got:] == -1)


def test_conf_filter_excludes_low_scores():
    boxes = np.array(
        [[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32
    )
    scores = np.array([0.9, 0.1], dtype=np.float32)
    cls = np.zeros(2, dtype=np.int32)
    _, out_scores, _, valid = map(
        np.asarray, nms_fixed(boxes, scores, cls, 0.25, 0.45, 2, 4)
    )
    assert valid.tolist() == [True, False, False, False]


def test_cross_class_boxes_do_not_suppress():
    """Identical boxes in different classes must all survive (per-class NMS)."""
    boxes = np.tile(np.array([[10, 10, 50, 50]], dtype=np.float32), (3, 1))
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    cls = np.array([0, 1, 2], dtype=np.int32)
    _, _, out_cls, valid = map(
        np.asarray, nms_fixed(boxes, scores, cls, 0.25, 0.45, 8, 8)
    )
    assert valid.sum() == 3
    assert sorted(out_cls[:3].tolist()) == [0, 1, 2]


def test_batched_nms_matches_single():
    rng = np.random.default_rng(7)
    b0, s0, c0 = _random_dets(rng, 100)
    b1, s1, c1 = _random_dets(rng, 100)
    batched = nms_fixed(
        np.stack([b0, b1]), np.stack([s0, s1]), np.stack([c0, c1]),
        0.25, 0.45, 128, 32,
    )
    single0 = nms_fixed(b0, s0, c0, 0.25, 0.45, 128, 32)
    for got, want in zip(batched, single0):
        np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want), atol=1e-6)
