"""DFL decode + anchors: golden tests vs a fresh numpy oracle implementing the
exported graph's decode chain (model.ncnn.param:184-195: reshape -> softmax ->
expectation conv [0..15] -> anchor add -> stride mul)."""

import numpy as np

from litepi_tpu.core.types import YOLO_PLUS_V2
from litepi_tpu.ops.anchors import make_anchors
from litepi_tpu.ops.dfl import decode_boxes, dfl_decode


def test_anchor_table_shape_and_layout():
    pts, strides = make_anchors(640, (8, 16, 32))
    assert pts.shape == (8400, 2)
    assert strides.shape == (8400, 1)
    # level sizes: 80^2 + 40^2 + 20^2 (model.ncnn.param:184-187)
    assert (strides[:6400] == 8).all()
    assert (strides[6400:8000] == 16).all()
    assert (strides[8000:] == 32).all()
    # first cell of each level is its centre (+0.5 offset), row-major x-fastest
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    np.testing.assert_allclose(pts[1], [1.5, 0.5])
    np.testing.assert_allclose(pts[80], [0.5, 1.5])
    np.testing.assert_allclose(pts[6400], [0.5, 0.5])


def test_num_anchors_matches_config():
    assert YOLO_PLUS_V2.num_anchors == 8400


def test_dfl_expectation_oracle():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 10, 64)).astype(np.float32)

    got = np.asarray(dfl_decode(logits, 16))

    resh = logits.reshape(3, 10, 4, 16)
    e = np.exp(resh - resh.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    want = (probs * np.arange(16)).sum(axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (3, 10, 4)
    assert (got >= 0).all() and (got <= 15).all()


def test_dfl_onehot_decodes_exact_distance():
    """A delta distribution on bin k must decode to distance exactly k."""
    logits = np.full((1, 1, 64), -40.0, dtype=np.float32)
    # sides l,t,r,b -> bins 2,0,5,7
    for side, k in enumerate([2, 0, 5, 7]):
        logits[0, 0, side * 16 + k] = 40.0
    d = np.asarray(dfl_decode(logits, 16))[0, 0]
    np.testing.assert_allclose(d, [2, 0, 5, 7], atol=1e-4)


def test_decode_boxes_geometry():
    pts, strides = make_anchors(640)
    # anchor 0 (P3, centre (0.5, 0.5), stride 8) with distances l=1,t=1,r=2,b=3
    dist = np.zeros((1, 8400, 4), dtype=np.float32)
    dist[0, 0] = [1.0, 1.0, 2.0, 3.0]

    xywh = np.asarray(decode_boxes(dist, pts, strides, xywh=True))[0, 0]
    # x1y1 = (0.5-1, 0.5-1) = (-0.5,-0.5); x2y2 = (2.5, 3.5)
    # centre (1.0, 1.5), wh (3, 4), x stride 8
    np.testing.assert_allclose(xywh, [8.0, 12.0, 24.0, 32.0], atol=1e-5)

    xyxy = np.asarray(decode_boxes(dist, pts, strides, xywh=False))[0, 0]
    np.testing.assert_allclose(xyxy, [-4.0, -4.0, 20.0, 28.0], atol=1e-5)


def test_decode_stride_scaling_per_level():
    pts, strides = make_anchors(640)
    dist = np.ones((1, 8400, 4), dtype=np.float32)
    out = np.asarray(decode_boxes(dist, pts, strides, xywh=True))
    # width = 2 cells * stride
    assert np.allclose(out[0, :6400, 2], 16.0)
    assert np.allclose(out[0, 6400:8000, 2], 32.0)
    assert np.allclose(out[0, 8000:, 2], 64.0)
