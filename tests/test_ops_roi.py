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


# --------------------------------------------------------------------- #
# windowed crop (crop_and_resize_windowed): must reproduce the dense     #
# path exactly for boxes whose extent fits the window, and stay sane     #
# (anti-aliased pyramid sampling) above it                               #
# --------------------------------------------------------------------- #

from litepi_tpu.ops.roi import crop_and_resize_windowed


def test_windowed_matches_dense_small_boxes():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(2, 640, 640, 3), dtype=np.uint8)
    # extents up to window-3 = 125 px, scattered incl. border-touching
    boxes = np.array(
        [
            [[3.4, 5.1, 120.0, 90.7], [502.2, 512.9, 626.0, 636.5]],
            [[0.0, 0.0, 125.0, 125.0], [300.5, 10.2, 310.9, 130.0]],
        ],
        dtype=np.float32,
    )
    valid = np.ones((2, 2), bool)
    dense = np.asarray(
        crop_and_resize(img, boxes, valid, 64, np.float32)
    )
    windowed = np.asarray(
        crop_and_resize_windowed(img, boxes, valid, 64, np.float32, 128)
    )
    np.testing.assert_allclose(windowed, dense, atol=1e-3, rtol=0)


def test_windowed_large_box_antialiased_sane():
    # a 500px box exceeds the 128 window -> sampled from the 4x pooled level;
    # on a constant image the result must still be exactly that constant
    img = np.full((1, 640, 640, 3), 19.0, np.float32)
    boxes = np.array([[[50.0, 60.0, 550.0, 560.0]]], np.float32)
    got = np.asarray(
        crop_and_resize_windowed(img, boxes, np.ones((1, 1), bool), 64,
                                 np.float32, 128)
    )
    np.testing.assert_allclose(got[0, 0], 19.0, atol=1e-3)


def test_windowed_large_box_close_to_dense_on_smooth_image():
    # smooth gradient: area-then-bilinear and plain bilinear agree closely
    yy, xx = np.mgrid[0:640, 0:640].astype(np.float32)
    img = np.stack([yy / 4, xx / 4, (yy + xx) / 8], axis=-1)[None]
    boxes = np.array([[[10.0, 20.0, 630.0, 620.0]]], np.float32)
    valid = np.ones((1, 1), bool)
    dense = np.asarray(crop_and_resize(img, boxes, valid, 64, np.float32))
    windowed = np.asarray(
        crop_and_resize_windowed(img, boxes, valid, 64, np.float32, 128)
    )
    assert np.abs(windowed - dense).max() < 1.5


def test_windowed_invalid_and_tiny_frame_fallback():
    img = np.ones((1, 96, 96, 3), np.float32) * 5.0  # min dim <= window
    boxes = np.array([[[2.0, 2.0, 20.0, 20.0], [0.0, 0.0, 9.0, 9.0]]],
                     np.float32)
    valid = np.array([[True, False]])
    got = np.asarray(
        crop_and_resize_windowed(img, boxes, valid, 16, np.float32, 128)
    )
    np.testing.assert_allclose(got[0, 0], 5.0, atol=1e-4)
    assert got[0, 1].sum() == 0.0


def test_windowed_uint8_input():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(1, 640, 640, 3), dtype=np.uint8)
    boxes = np.array([[[100.0, 100.0, 180.0, 190.0]]], np.float32)
    valid = np.ones((1, 1), bool)
    a = np.asarray(crop_and_resize_windowed(img, boxes, valid, 64,
                                            np.float32, 128))
    b = np.asarray(crop_and_resize_windowed(img.astype(np.float32), boxes,
                                            valid, 64, np.float32, 128))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_windowed_zero_window_falls_back_to_dense():
    """roi_window=0 is the dense sentinel — must NOT produce zero crops
    (regression: the pyramid loop used to run away and emit empties)."""
    img = np.full((1, 640, 640, 3), 7.0, np.float32)
    boxes = np.array([[[5.0, 5.0, 70.0, 70.0]]], np.float32)
    got = np.asarray(
        crop_and_resize_windowed(img, boxes, np.ones((1, 1), bool), 16,
                                 np.float32, 0)
    )
    np.testing.assert_allclose(got[0, 0], 7.0, atol=1e-4)
