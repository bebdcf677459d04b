"""Box math golden tests vs fresh numpy oracles."""

import numpy as np

from litepi_tpu.ops.boxes import (
    box_iou,
    clip_boxes,
    unletterbox_boxes,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from litepi_tpu.ops.letterbox import letterbox_params


def _rand_xyxy(rng, n, scale=640.0):
    x1 = rng.uniform(0, scale * 0.9, n)
    y1 = rng.uniform(0, scale * 0.9, n)
    w = rng.uniform(1, scale * 0.1, n)
    h = rng.uniform(1, scale * 0.1, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)


def test_xywh_roundtrip():
    rng = np.random.default_rng(1)
    boxes = _rand_xyxy(rng, 100)
    back = np.asarray(xywh_to_xyxy(xyxy_to_xywh(boxes)))
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_iou_against_numpy_oracle():
    rng = np.random.default_rng(2)
    a = _rand_xyxy(rng, 20)
    b = _rand_xyxy(rng, 30)

    def oracle(a, b):
        out = np.zeros((len(a), len(b)))
        for i, p in enumerate(a):
            for j, q in enumerate(b):
                xx1, yy1 = max(p[0], q[0]), max(p[1], q[1])
                xx2, yy2 = min(p[2], q[2]), min(p[3], q[3])
                inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
                area_p = (p[2] - p[0]) * (p[3] - p[1])
                area_q = (q[2] - q[0]) * (q[3] - q[1])
                out[i, j] = inter / (area_p + area_q - inter + 1e-6)
        return out

    np.testing.assert_allclose(np.asarray(box_iou(a, b)), oracle(a, b), atol=1e-5)


def test_iou_identity_is_one():
    rng = np.random.default_rng(3)
    a = _rand_xyxy(rng, 10)
    diag = np.diag(np.asarray(box_iou(a, a)))
    np.testing.assert_allclose(diag, 1.0, atol=1e-4)


def test_unletterbox_inverts_letterbox_mapping():
    """A box drawn in original pixels, mapped through the letterbox transform
    into 640-space, must come back to itself via unletterbox_boxes
    (reference mapping: e2e.py:266-278)."""
    h, w = 681, 1198
    r, dw, dh, _, _ = letterbox_params(h, w, 640)
    rng = np.random.default_rng(4)
    orig = _rand_xyxy(rng, 50, scale=600.0)
    in_640 = orig * r + np.array([dw, dh, dw, dh], dtype=np.float32)
    back = np.asarray(unletterbox_boxes(in_640, r, dw, dh, w, h))
    np.testing.assert_allclose(back, orig, atol=1e-3)


def test_clip_boxes():
    boxes = np.array([[-5.0, -5.0, 700.0, 300.0]], dtype=np.float32)
    out = np.asarray(clip_boxes(boxes, 640, 480))
    np.testing.assert_array_equal(out, [[0.0, 0.0, 640.0, 300.0]])
