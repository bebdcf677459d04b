"""Letterbox parity: device letterbox vs the cv2-exact host implementation.

The reference letterboxes with cv2 (e2e.py:66-86); sub-pixel drift here is the
likeliest source of mAP divergence, so geometry must be exact and resampled
values close.
"""

import numpy as np
import pytest

from litepi_tpu.ops.letterbox import (
    letterbox_device,
    letterbox_host,
    letterbox_params,
)


@pytest.mark.parametrize(
    "h,w",
    [(2048, 2048), (681, 1198), (480, 640), (640, 640), (333, 517)],
)
def test_params_match_reference_rounding(h, w):
    r, dw, dh, (new_w, new_h), (top, bottom, left, right) = letterbox_params(h, w, 640)
    # geometry invariants from the reference formula
    assert new_h + top + bottom == 640
    assert new_w + left + right == 640
    assert abs(new_w - round(w * r)) == 0
    assert abs(new_h - round(h * r)) == 0
    # the reference's asymmetric rounding split: round(d -/+ 0.1)
    assert top == int(round(dh - 0.1))
    assert bottom == int(round(dh + 0.1))


@pytest.mark.parametrize("h,w", [(681, 1198), (480, 640), (2048, 2048)])
def test_device_matches_host(h, w):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    host_out, r, (dw, dh) = letterbox_host(img, 640)
    dev_out = np.asarray(letterbox_device(img[None], 640))[0]

    assert host_out.shape == (640, 640, 3)
    assert dev_out.shape == (640, 640, 3)
    # Padding regions must be bit-identical (value 114).
    _, _, _, (new_w, new_h), (top, bottom, left, right) = letterbox_params(h, w, 640)
    if top:
        assert np.all(dev_out[:top] == 114.0)
        assert np.all(host_out[:top] == 114)
    if left:
        assert np.all(dev_out[:, :left] == 114.0)
    # Resampled interior: cv2 uses fixed-point bilinear; ours is float.
    interior = np.abs(
        dev_out[top : top + new_h, left : left + new_w]
        - host_out[top : top + new_h, left : left + new_w].astype(np.float32)
    )
    assert interior.mean() < 1.0
    assert np.percentile(interior, 99) <= 2.0


def test_identity_resolution_is_exact():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(640, 640, 3), dtype=np.uint8)
    dev_out = np.asarray(letterbox_device(img[None], 640))[0]
    np.testing.assert_array_equal(dev_out, img.astype(np.float32))
