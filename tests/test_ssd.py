"""SSD300 baseline: anchor grid, forward contract, decode and multibox loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# every test here builds the full baseline model (heavy on 1 CPU)
pytestmark = pytest.mark.slow

from litepi_tpu.models.ssd import (
    NUM_SSD_BOXES,
    SSD300,
    SSD_BOXES_PER_CELL,
    SSD_GRIDS,
    decode_ssd_boxes,
    ssd_default_boxes,
)
from litepi_tpu.ops.boxes import xywh_to_xyxy
from litepi_tpu.train.ssd_loss import encode_boxes, multibox_loss


def test_default_box_grid():
    db = ssd_default_boxes(300)
    assert db.shape == (8732, 4)
    assert NUM_SSD_BOXES == 8732
    # first cell of conv4_3: centre at (0.5/38)*300
    np.testing.assert_allclose(db[0, :2], [300 * 0.5 / 38] * 2, atol=1e-4)
    # square box of scale 0.07 -> 21 px
    np.testing.assert_allclose(db[0, 2:], [21.0, 21.0], atol=0.2)
    assert (db >= 0).all() and (db[:, :2] <= 300).all()


@pytest.fixture(scope="module")
def ssd_model_and_vars():
    model = SSD300(num_classes=3)
    x = jnp.zeros((1, 300, 300, 3))
    variables = model.init(jax.random.key(0), x)
    return model, variables


def test_forward_contract(ssd_model_and_vars):
    model, variables = ssd_model_and_vars
    out = model.apply(variables, jnp.zeros((2, 300, 300, 3)))
    assert out["loc"].shape == (2, 8732, 4)
    assert out["conf"].shape == (2, 8732, 4)  # 3 fg + background


def test_param_count_vgg_scale(ssd_model_and_vars):
    _, variables = ssd_model_and_vars
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # torchvision ssd300_vgg16 is ~26M (35.6M with 91 classes)
    assert 20e6 < n < 40e6, n


def test_encode_decode_roundtrip():
    db = jnp.asarray(ssd_default_boxes(300))
    rng = np.random.default_rng(0)
    # random boxes near default boxes
    gt_xywh = np.asarray(db).copy()
    gt_xywh[:, :2] += rng.uniform(-5, 5, (8732, 2))
    gt_xywh[:, 2:] *= rng.uniform(0.8, 1.25, (8732, 2))
    gt_xyxy = np.asarray(xywh_to_xyxy(jnp.asarray(gt_xywh)))
    enc = encode_boxes(jnp.asarray(gt_xyxy), db)
    dec = np.asarray(decode_ssd_boxes(enc, db))
    np.testing.assert_allclose(dec, gt_xyxy, atol=0.1)


def test_multibox_loss_drops_with_perfect_predictions():
    db_xywh = jnp.asarray(ssd_default_boxes(300))
    db_xyxy = xywh_to_xyxy(db_xywh)
    gt = jnp.asarray([[[30.0, 30.0, 90.0, 90.0], [150.0, 150.0, 260.0, 260.0]]])
    labels = jnp.asarray([[1, 2]], jnp.int32)
    mask = jnp.ones((1, 2), bool)

    # perfect predictions: encoded gt at matched anchors, confident logits
    from litepi_tpu.ops.boxes import box_iou

    iou = np.asarray(box_iou(gt, db_xyxy[None]))[0]  # (2, 8732)
    loc = np.zeros((1, 8732, 4), np.float32)
    conf = np.zeros((1, 8732, 4), np.float32)
    conf[..., 0] = 8.0  # background everywhere
    for g in range(2):
        matched = np.nonzero(iou[g] >= 0.5)[0]
        if matched.size == 0:
            matched = np.asarray([iou[g].argmax()])
        enc = np.asarray(encode_boxes(gt[0, g], db_xywh[matched]))
        loc[0, matched] = enc
        conf[0, matched] = 0.0
        conf[0, matched, labels[0, g] + 1] = 12.0

    good, aux_good = multibox_loss(
        {"loc": jnp.asarray(loc), "conf": jnp.asarray(conf)},
        db_xyxy, db_xywh, gt, labels, mask,
    )
    bad, _ = multibox_loss(
        {"loc": jnp.zeros((1, 8732, 4)), "conf": jnp.zeros((1, 8732, 4))},
        db_xyxy, db_xywh, gt, labels, mask,
    )
    assert float(good) < 0.1 * float(bad)
    assert int(aux_good["num_pos"]) >= 2


@pytest.mark.slow
def test_ssd_loss_decreases_with_training():
    """A few optimizer steps on one synthetic batch must reduce the multibox
    loss through the real SSD300 forward (training-validation smoke)."""
    import optax

    from litepi_tpu.models.init_utils import fast_init

    model = SSD300(num_classes=2)
    # SSD300's grids assume a 300 input; init must trace at full size
    variables = fast_init(model, seed=0, spatial=300)
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    db_xywh = jnp.asarray(ssd_default_boxes(300))
    db_xyxy = xywh_to_xyxy(db_xywh)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 300, 300, 3)), jnp.float32)
    gt = jnp.asarray(
        [
            [[30.0, 30.0, 120.0, 120.0], [0.0, 0.0, 0.0, 0.0]],
            [[150.0, 150.0, 280.0, 260.0], [40.0, 200.0, 110.0, 270.0]],
        ]
    )
    labels = jnp.asarray([[0, 0], [1, 0]], jnp.int32)
    mask = jnp.asarray([[True, False], [True, True]])

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, imgs)
            loss, _ = multibox_loss(
                out, db_xyxy, db_xywh, gt, labels, mask
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_opt, loss

    first = None
    for _ in range(8):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < 0.9 * first, (first, float(loss))


def test_multibox_loss_gradients_flow():
    db_xywh = jnp.asarray(ssd_default_boxes(300))
    db_xyxy = xywh_to_xyxy(db_xywh)
    gt = jnp.asarray([[[30.0, 30.0, 90.0, 90.0]]])
    labels = jnp.zeros((1, 1), jnp.int32)
    mask = jnp.ones((1, 1), bool)

    def loss_fn(loc, conf):
        return multibox_loss(
            {"loc": loc, "conf": conf}, db_xyxy, db_xywh, gt, labels, mask
        )[0]

    g_loc, g_conf = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.zeros((1, 8732, 4)), jnp.zeros((1, 8732, 2))
    )
    assert float(jnp.abs(g_loc).sum()) > 0
    assert float(jnp.abs(g_conf).sum()) > 0
    assert bool(jnp.isfinite(g_loc).all()) and bool(jnp.isfinite(g_conf).all())
