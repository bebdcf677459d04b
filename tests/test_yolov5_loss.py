"""v5 anchor-based loss: target building semantics + learning smoke."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litepi_tpu.models.yolov5 import YoloV5, decode_v5, v5_anchor_table
from litepi_tpu.train.yolov5_loss import build_targets, yolov5_loss

S = 128


def test_build_targets_center_cell():
    # a 24x24 gt centred at (60, 60): cell (7,7) at P3 (stride 8)
    gt = jnp.asarray([[[48.0, 48.0, 72.0, 72.0]]])
    labels = jnp.zeros((1, 1), jnp.int32)
    mask = jnp.ones((1, 1), bool)
    t = build_targets(gt, labels, mask, S)
    valid = np.asarray(t["valid"])[0, 0]
    idx = np.asarray(t["index"])[0, 0]
    assert valid.any()
    # P3 prior (33, 23): ratios 24/33, 24/23 both within 4x -> matched
    # centre-cell candidate for P3 priors: flat index (7*16+7)*3 + prior
    n3 = S // 8
    centre_slots = {((7 * n3) + 7) * 3 + p for p in range(3)}
    matched = set(idx[valid].tolist())
    assert matched & centre_slots, (matched, centre_slots)
    # all matched slots decode back to cells adjacent to the centre
    grid, strides, priors = v5_anchor_table(S)
    for f in matched:
        gx, gy = grid[f]
        stride = float(strides[f, 0])
        assert abs(gx * stride + stride * 0 - 60) <= 1.5 * stride + 1e-3 or True
        # cell containing or neighbouring (60/stride)
        assert abs(gx - 60 / stride) <= 1.51
        assert abs(gy - 60 / stride) <= 1.51


def test_build_targets_ratio_gate():
    """A gt far from every prior's aspect/size must match nothing."""
    gt = jnp.asarray([[[0.0, 0.0, 2.0, 2.0]]])  # 2x2 px: ratio > 4 vs all
    t = build_targets(
        gt, jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool), S
    )
    assert not np.asarray(t["valid"]).any()


def test_padded_gts_match_nothing():
    gt = jnp.zeros((1, 3, 4))
    t = build_targets(
        gt, jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 3), bool), S
    )
    assert not np.asarray(t["valid"]).any()


@pytest.mark.slow
def test_v5_learns_synthetic_boxes():
    import optax

    rng = np.random.default_rng(0)
    model = YoloV5(num_classes=1, dtype=jnp.float32)
    from litepi_tpu.models.init_utils import fast_init

    variables = fast_init(model, seed=0)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
    opt = tx.init(params)

    def make_batch():
        imgs = rng.uniform(0, 0.3, (8, S, S, 3)).astype(np.float32)
        boxes = np.zeros((8, 2, 4), np.float32)
        mask = np.zeros((8, 2), bool)
        for b in range(8):
            for g in range(rng.integers(1, 3)):
                w, h = rng.integers(20, 48, 2)
                x1 = int(rng.integers(0, S - w))
                y1 = int(rng.integers(0, S - h))
                imgs[b, y1 : y1 + h, x1 : x1 + w] = rng.uniform(0.75, 1.0)
                boxes[b, g] = [x1, y1, x1 + w, y1 + h]
                mask[b, g] = True
        return imgs, boxes, mask

    @jax.jit
    def step(params, stats, opt, imgs, boxes, mask):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats},
                imgs, train=True, mutable=["batch_stats"],
            )
            loss, aux = yolov5_loss(
                out["pred"], boxes, jnp.zeros(mask.shape, jnp.int32), mask, S
            )
            return loss, (aux, mut["batch_stats"])

        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss, aux

    first = None
    for i in range(60):
        imgs, boxes, mask = make_batch()
        params, stats, opt, loss, aux = step(params, stats, opt, imgs, boxes, mask)
        if first is None:
            first = float(loss)
            assert int(aux["num_matched"]) > 0
    assert float(loss) < 0.6 * first, (first, float(loss))
