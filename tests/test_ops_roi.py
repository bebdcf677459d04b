"""ROI crop+resize golden tests vs cv2 host crops (the reference's ROI path:
integer-truncated slice then resize to 64x64, e2e.py:459-485)."""

import cv2
import numpy as np

from litepi_tpu.ops.roi import crop_and_resize


def test_matches_cv2_crop_resize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    boxes = np.array(
        [[100.7, 50.2, 300.9, 200.4], [10.0, 10.0, 74.0, 74.0]], dtype=np.float32
    )
    valid = np.array([True, True])

    got = np.asarray(
        crop_and_resize(img[None].astype(np.float32), boxes[None], valid[None], 64)
    )[0]

    for i, b in enumerate(boxes):
        x1, y1, x2, y2 = map(int, b)
        ref = cv2.resize(
            img[y1:y2, x1:x2].astype(np.float32), (64, 64),
            interpolation=cv2.INTER_LINEAR,
        )
        err = np.abs(got[i] - ref)
        assert err.mean() < 1.0, f"box {i}: mean err {err.mean()}"


def test_identity_crop_is_exact():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 64.0, 64.0]], dtype=np.float32)
    got = np.asarray(crop_and_resize(img[None], boxes[None], np.array([[True]]), 64))
    np.testing.assert_allclose(got[0, 0], img, atol=1e-3)


def test_invalid_slots_are_zero():
    img = np.ones((1, 32, 32, 3), dtype=np.float32)
    boxes = np.zeros((1, 4, 4), dtype=np.float32)
    boxes[0, :, 2:] = 10.0
    valid = np.array([[True, False, True, False]])
    got = np.asarray(crop_and_resize(img, boxes, valid, 16))
    assert got[0, 1].sum() == 0.0 and got[0, 3].sum() == 0.0
    assert got[0, 0].sum() > 0.0


def test_out_of_bounds_boxes_clamp_not_crash():
    img = np.ones((1, 32, 32, 3), dtype=np.float32) * 7.0
    boxes = np.array([[[-10.0, -10.0, 100.0, 100.0]]], dtype=np.float32)
    got = np.asarray(crop_and_resize(img, boxes, np.array([[True]]), 8))
    np.testing.assert_allclose(got[0, 0], 7.0)
