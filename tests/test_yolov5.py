"""YOLOv5n baseline: structure, anchor tables and the v5 sigmoid decode."""

import jax
import jax.numpy as jnp
import numpy as np

from litepi_tpu.models.yolov5 import (
    YoloV5,
    decode_v5,
    v5_anchor_table,
)


def test_forward_contract_and_params():
    model = YoloV5(num_classes=1)
    assert model.channels == (16, 32, 64, 128, 256)
    x = jnp.zeros((1, 320, 320, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    # 3 priors x (40^2 + 20^2 + 10^2) cells = 6300 predictions at 320
    assert out["pred"].shape == (1, 6300, 6)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # v5n is ~1.9M params (1 class)
    assert 1.3e6 < n < 2.6e6, n


def test_anchor_table_order():
    grid, strides, priors = v5_anchor_table(320)
    assert grid.shape == (6300, 2) and priors.shape == (6300, 2)
    # first cell (0,0) at P3 with the three P3 priors
    np.testing.assert_allclose(grid[0], [0, 0])
    np.testing.assert_allclose(priors[:3], [[10, 13], [16, 30], [33, 23]])
    np.testing.assert_allclose(grid[3], [1, 0])  # next cell, x-fastest
    assert (strides[: 40 * 40 * 3] == 8).all()
    assert (strides[-10 * 10 * 3 :] == 32).all()


def test_v5_decode_geometry():
    grid, strides, priors = map(jnp.asarray, v5_anchor_table(320))
    pred = np.full((1, 6300, 6), -20.0, np.float32)  # sigmoid ~ 0
    a = 3 * (40 * 5 + 5)  # prior 0 of cell (x=5, y=5) at P3
    # t_xy = 0 -> sigmoid .5 -> offset (2*.5-.5)=0.5 -> centre (5.5)*8 = 44
    pred[0, a, 0:2] = 0.0
    # t_wh = 0 -> (2*0.5)^2 = 1 -> wh = prior (10, 13)
    pred[0, a, 2:4] = 0.0
    pred[0, a, 4] = 10.0  # objectness ~ 1
    pred[0, a, 5] = 10.0  # class ~ 1
    boxes, scores, cls = decode_v5(jnp.asarray(pred), grid, strides, priors)
    np.testing.assert_allclose(
        np.asarray(boxes)[0, a], [44 - 5, 44 - 6.5, 44 + 5, 44 + 6.5], atol=1e-3
    )
    assert float(scores[0, a]) > 0.99
    # everything else is near-zero score
    s = np.asarray(scores[0])
    assert (np.delete(s, a) < 1e-4).all()


def test_v5_wh_saturates_at_4x_prior():
    grid, strides, priors = map(jnp.asarray, v5_anchor_table(320))
    pred = np.zeros((1, 6300, 6), np.float32)
    pred[0, 0, 2:4] = 50.0  # sigmoid -> 1 -> (2)^2 = 4x prior
    boxes, _, _ = decode_v5(jnp.asarray(pred), grid, strides, priors)
    w = float(boxes[0, 0, 2] - boxes[0, 0, 0])
    np.testing.assert_allclose(w, 4 * 10.0, atol=1e-2)
