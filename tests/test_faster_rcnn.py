"""Faster R-CNN baseline: forward contract, RoIAlign geometry, matcher and
loss behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# every test here builds the full baseline model (heavy on 1 CPU)
pytestmark = pytest.mark.slow

from litepi_tpu.models.faster_rcnn import (
    FasterRCNN,
    decode_deltas,
    encode_deltas,
    postprocess_detections,
    roi_align,
    rpn_anchors,
)
from litepi_tpu.train.frcnn_loss import frcnn_loss, subsample_mask


def test_anchor_count():
    a = rpn_anchors(128)
    assert a.shape == (3 * (32**2 + 16**2 + 8**2 + 4**2 + 2**2), 4)
    # first cell: centred at stride/2, size-32 anchors
    np.testing.assert_allclose((a[1, :2] + a[1, 2:]) / 2, [2.0, 2.0], atol=1e-4)
    w = a[1, 2] - a[1, 0]
    np.testing.assert_allclose(w, 32.0, atol=1e-3)  # ratio 1.0 is index 1


def test_delta_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(rpn_anchors(128)[:50])
    gt = anchors + jnp.asarray(rng.uniform(-3, 3, (50, 4)), jnp.float32)
    enc = encode_deltas(gt, anchors)
    dec = decode_deltas(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt), atol=1e-3)


def test_roi_align_constant_region():
    """A constant-valued region must pool to that constant on every level."""
    hmax = 32
    pyr = np.zeros((4, hmax, hmax, 8), np.float32)
    for lv in range(4):
        n = hmax >> lv
        pyr[lv, :n, :n] = float(lv + 1)
    # small ROI -> level 0; large ROI -> higher level (stride-4 base)
    rois = jnp.asarray([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 120.0, 120.0]])
    valid = jnp.asarray([True, True])
    out = np.asarray(roi_align(jnp.asarray(pyr), rois, valid))
    assert out.shape == (2, 7, 7, 8)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-5)  # 32px roi -> P2
    assert out[1].mean() > 1.0  # 120px roi assigned to a coarser level


@pytest.fixture(scope="module")
def tiny_frcnn():
    model = FasterRCNN(
        num_classes=2, input_size=128, pre_nms_topk=128, post_nms_topk=32
    )
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_forward_and_postprocess(tiny_frcnn):
    model, variables = tiny_frcnn
    out = model.apply(variables, jnp.zeros((2, 128, 128, 3)), train=False)
    assert out["proposals"].shape == (2, 32, 4)
    assert out["roi_cls"].shape == (2, 32, 3)
    assert out["roi_reg"].shape == (2, 32, 3, 4)
    b, s, c, v = postprocess_detections(out, 128, conf_threshold=0.0)
    assert b.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(b)).all()


def test_subsample_mask_budget():
    key = jax.random.key(0)
    mask = jnp.asarray([[True] * 50 + [False] * 50])
    out = np.asarray(subsample_mask(mask, 10, key))
    assert out.sum() == 10
    assert not out[0, 50:].any()
    # fewer eligible than budget: keep all
    mask2 = jnp.asarray([[True] * 3 + [False] * 97])
    assert np.asarray(subsample_mask(mask2, 10, key)).sum() == 3


@pytest.mark.slow
def test_frcnn_loss_decreases_with_training(tiny_frcnn):
    """A few optimizer steps must reduce the combined RPN+ROI loss through
    the real forward (training-validation smoke for the heaviest baseline)."""
    import optax

    model, variables = tiny_frcnn
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[20.0, 20.0, 70.0, 70.0]]])
    gt_labels = jnp.zeros((1, 1), jnp.int32)
    gt_mask = jnp.ones((1, 1), bool)

    from litepi_tpu.train.frcnn_loss import frcnn_loss as floss

    @jax.jit
    def step(params, stats, opt, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
            )
            loss, _ = floss(out, gt_boxes, gt_labels, gt_mask, key)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    key = jax.random.key(0)
    first = None
    for _ in range(6):
        key, sub = jax.random.split(key)
        params, stats, opt, loss = step(params, stats, opt, sub)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < 0.95 * first, (first, float(loss))


def test_frcnn_loss_finite_and_differentiable(tiny_frcnn):
    model, variables = tiny_frcnn
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[20.0, 20.0, 70.0, 70.0], [80.0, 80.0, 120.0, 120.0]]])
    gt_labels = jnp.asarray([[0, 1]], jnp.int32)
    gt_mask = jnp.ones((1, 2), bool)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        loss, aux = frcnn_loss(
            out, gt_boxes, gt_labels, gt_mask, jax.random.key(1)
        )
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    assert int(aux["rpn_pos"]) > 0  # forced best-anchor matching found gts
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
