"""Pallas windowed ROI crop kernel vs the dense hat-matmul oracle.

The kernel (ops/pallas_roi.py) must be bit-exact against the dense bf16
crop (ops/roi.py::crop_and_resize) for any box with extent <=
EXACT_EXTENT, and sane (anti-aliased pyramid sampling) above it.  Runs in
interpreter mode so CI needs no TPU (mirrors tests/test_pallas_nms.py).
"""

import numpy as np
import jax.numpy as jnp

from litepi_tpu.ops.roi import crop_and_resize
from litepi_tpu.ops.pallas_roi import EXACT_EXTENT, pallas_crop_and_resize


def _dense(img, boxes, valid):
    return np.asarray(crop_and_resize(img, boxes, valid, 64, jnp.bfloat16))


def _kernel(img, boxes, valid):
    return np.asarray(pallas_crop_and_resize(img, boxes, valid, 64, True))


def test_matches_dense_small_boxes_bit_exact():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(2, 640, 640, 3), dtype=np.uint8)
    m = float(EXACT_EXTENT)
    boxes = np.array(
        [
            [[3.4, 5.1, 3.4 + m, 5.1 + 80.0], [521.2, 524.9, 638.0, 636.5]],
            [[0.0, 0.0, m, m], [300.5, 10.2, 310.9, 10.2 + m]],
        ],
        dtype=np.float32,
    )
    valid = np.ones((2, 2), bool)
    np.testing.assert_array_equal(
        _kernel(img, boxes, valid), _dense(img, boxes, valid)
    )


def test_invalid_slots_zero():
    img = np.full((1, 640, 640, 3), 100, np.uint8)
    boxes = np.array([[[5.0, 5.0, 60.0, 60.0], [5.0, 5.0, 60.0, 60.0]]],
                     np.float32)
    valid = np.array([[True, False]])
    got = _kernel(img, boxes, valid)
    assert got[0, 0].sum() > 0 and got[0, 1].sum() == 0


def test_large_box_pyramid_constant_image():
    img = np.full((1, 640, 640, 3), 19, np.uint8)
    boxes = np.array([[[50.0, 60.0, 550.0, 560.0]]], np.float32)
    got = _kernel(img, boxes, np.ones((1, 1), bool))
    # area-then-bilinear over a constant stays that constant (up to the
    # uint8 pyramid rounding)
    assert np.abs(got - 19.0).max() < 1.0


def test_large_box_close_to_dense_on_smooth_image():
    yy, xx = np.mgrid[0:640, 0:640].astype(np.float32)
    img = np.stack([yy / 4, xx / 4, (yy + xx) / 8], axis=-1)[None]
    img = np.round(img).astype(np.uint8)
    boxes = np.array([[[10.0, 20.0, 630.0, 620.0]]], np.float32)
    valid = np.ones((1, 1), bool)
    dense = _dense(img, boxes, valid)
    got = _kernel(img, boxes, valid)
    assert np.abs(got - dense).max() < 2.0


def test_border_and_degenerate_boxes():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(1, 640, 640, 3), dtype=np.uint8)
    boxes = np.array(
        [[[0.0, 0.0, 1.0, 1.0],          # 1px box
          [639.0, 639.0, 640.0, 640.0],  # bottom-right corner
          [630.0, 2.0, 640.0, 40.0]]],   # right-edge straddle
        np.float32,
    )
    valid = np.ones((1, 3), bool)
    np.testing.assert_array_equal(
        _kernel(img, boxes, valid), _dense(img, boxes, valid)
    )


def test_zero_roi_budget_returns_empty():
    img = np.zeros((1, 640, 640, 3), np.uint8)
    boxes = np.zeros((1, 0, 4), np.float32)
    valid = np.zeros((1, 0), bool)
    got = np.asarray(pallas_crop_and_resize(img, boxes, valid, 64, True))
    assert got.shape == (1, 0, 64, 64, 3)


def test_float32_compute_dtype():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(1, 640, 640, 3), dtype=np.uint8)
    boxes = np.array([[[10.0, 10.0, 90.0, 90.0]]], np.float32)
    valid = np.ones((1, 1), bool)
    got = np.asarray(
        pallas_crop_and_resize(img, boxes, valid, 64, True, jnp.float32)
    )
    ref = np.asarray(
        crop_and_resize(img, boxes, valid, 64, jnp.float32)
    )
    np.testing.assert_allclose(got, ref, atol=1e-3)
