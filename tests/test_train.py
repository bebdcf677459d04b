"""Training: TAL assigner semantics, loss gradients, and a sharded full train
step on the virtual 8-device CPU mesh (the multi-chip contract)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litepi_tpu.core.types import DetectorConfig
from litepi_tpu.models import build_classifier
from litepi_tpu.ops.anchors import make_anchors
from litepi_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from litepi_tpu.train.classifier import (
    classifier_train_step,
    create_classifier_train_state,
)
from litepi_tpu.train.detector import (
    create_detector_train_state,
    detector_train_step,
)
from litepi_tpu.train.losses import (
    detection_loss,
    pairwise_iou_ciou,
    task_aligned_assign,
)

TINY = DetectorConfig(
    name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=64
)


def test_ciou_perfect_match_is_one():
    box = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
    iou, ciou = pairwise_iou_ciou(box, box)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(ciou[0, 0], 1.0, atol=1e-4)


def test_ciou_penalises_distance():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    near = jnp.asarray([[12.0, 0.0, 22.0, 10.0]])
    far = jnp.asarray([[50.0, 50.0, 60.0, 60.0]])
    _, c_near = pairwise_iou_ciou(a, near)
    _, c_far = pairwise_iou_ciou(a, far)
    assert c_far[0, 0] < c_near[0, 0] < 0.0  # disjoint boxes: negative CIoU


def test_tal_assigns_best_anchor():
    """An anchor centred in the gt with a perfect box + confident score must
    be foreground and carry the max target score."""
    anchors, strides = make_anchors(64, (8, 16, 32))
    centers = jnp.asarray(anchors * strides)  # (84, 2) pixels
    A = centers.shape[0]

    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]])  # (1, 1, 4)
    gt_labels = jnp.zeros((1, 1), jnp.int32)
    gt_mask = jnp.ones((1, 1), bool)

    # predictions: every anchor predicts a unit box at its centre except the
    # "good" anchor which predicts the gt exactly with high confidence
    inside = (
        (centers[:, 0] > 8) & (centers[:, 0] < 40)
        & (centers[:, 1] > 8) & (centers[:, 1] < 40)
    )
    good = int(np.argmax(np.asarray(inside)))
    pred_boxes = jnp.concatenate([centers - 0.5, centers + 0.5], axis=-1)[None]
    pred_boxes = pred_boxes.at[0, good].set(gt_boxes[0, 0])
    pred_scores = jnp.full((1, A, 1), 0.1)
    pred_scores = pred_scores.at[0, good, 0].set(0.95)

    out = task_aligned_assign(
        pred_scores, pred_boxes, centers, gt_boxes, gt_labels, gt_mask
    )
    fg = np.asarray(out["fg"])[0]
    assert fg[good]
    assert not fg[~np.asarray(inside)].any(), "anchors outside gt became fg"
    ts = np.asarray(out["target_scores"])[0]
    assert ts.argmax() == good
    # normalisation: the best anchor's score equals the gt's best IoU (=1)
    np.testing.assert_allclose(ts[good], 1.0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["target_boxes"])[0, good], [8, 8, 40, 40], atol=1e-5
    )


def test_tal_empty_image_all_background():
    anchors, strides = make_anchors(64, (8, 16, 32))
    centers = jnp.asarray(anchors * strides)
    A = centers.shape[0]
    out = task_aligned_assign(
        jnp.full((1, A, 1), 0.5),
        jnp.concatenate([centers - 2, centers + 2], -1)[None],
        centers,
        jnp.zeros((1, 2, 4)),
        jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 2), bool),
    )
    assert not np.asarray(out["fg"]).any()
    assert np.asarray(out["target_scores"]).sum() == 0


def _tiny_batch(rng, b=2, g=3, size=64):
    images = rng.uniform(0, 1, (b, size, size, 3)).astype(np.float32)
    x1 = rng.uniform(0, size * 0.6, (b, g))
    y1 = rng.uniform(0, size * 0.6, (b, g))
    w = rng.uniform(8, size * 0.3, (b, g))
    h = rng.uniform(8, size * 0.3, (b, g))
    gt = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    return {
        "images": images,
        "gt_boxes": gt,
        "gt_labels": np.zeros((b, g), np.int32),
        "gt_mask": np.ones((b, g), bool),
    }


@pytest.mark.slow
def test_detector_loss_finite_and_differentiable():
    model, state, tx = create_detector_train_state(TINY, dtype=jnp.float32)
    batch = _tiny_batch(np.random.default_rng(0))
    step = jax.jit(functools.partial(detector_train_step, model, tx))
    new_state, m = step(state, batch)
    assert np.isfinite(m["loss"])
    assert m["num_fg"] > 0
    # params actually moved
    delta = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, new_state.params,
    )
    assert max(jax.tree.leaves(delta)) > 0


@pytest.mark.slow
def test_detector_overfits_tiny_batch():
    """Loss must fall substantially when repeatedly stepping on one batch."""
    model, state, tx = create_detector_train_state(TINY, lr=5e-3, dtype=jnp.float32)
    batch = _tiny_batch(np.random.default_rng(1))
    step = jax.jit(functools.partial(detector_train_step, model, tx))
    first = None
    for i in range(12):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < 0.85 * first, (first, float(m["loss"]))


def test_classifier_train_step_learns():
    model = build_classifier("shufflenetv2", 4)
    state, tx = create_classifier_train_state(model, input_size=32, lr=3e-3)
    rng = np.random.default_rng(0)
    # four linearly-separable colour classes
    labels = rng.integers(0, 4, 32)
    images = np.zeros((32, 32, 32, 3), np.float32)
    for i, l in enumerate(labels):
        images[i, :, :, l % 3] = 1.0 * (1 if l < 3 else 0.5)
    batch = {"images": images, "labels": labels}
    step = jax.jit(functools.partial(classifier_train_step, model, tx))
    key = jax.random.key(0)
    losses = []
    for i in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_detector_train_step_sharded_over_mesh():
    """The full train step jitted over an 8-device ('data','model') mesh:
    batch sharded, params replicated — the dryrun_multichip contract."""
    mesh = make_mesh(8, backend="cpu")
    model, state, tx = create_detector_train_state(TINY, dtype=jnp.float32)
    batch = _tiny_batch(np.random.default_rng(2), b=8)

    state = jax.device_put(state, replicated_sharding(mesh))
    batch = jax.device_put(batch, batch_sharding(mesh))
    step = jax.jit(functools.partial(detector_train_step, model, tx))
    new_state, m = step(state, batch)
    assert np.isfinite(m["loss"])
    # params remain replicated after the step (grad psum happened inside)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_detector_ema_follows_ultralytics_recipe():
    """EMA params follow e' = d*e + (1-d)*p with d = 0.9999*(1-exp(-t/2000)),
    replayed exactly from the recorded per-step params."""
    model, state, tx = create_detector_train_state(TINY, dtype=jnp.float32)
    batch = _tiny_batch(np.random.default_rng(2))
    step = jax.jit(functools.partial(detector_train_step, model, tx))

    expected = jax.tree.map(np.asarray, state.ema_params)
    for t in range(1, 4):
        state, _ = step(state, batch)
        d = 0.9999 * (1.0 - np.exp(-t / 2000.0))
        expected = jax.tree.map(
            lambda e, p: e * d + (1.0 - d) * np.asarray(p),
            expected, state.params,
        )
    got = jax.tree.map(np.asarray, state.ema_params)
    err = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), got, expected
    )
    assert max(jax.tree.leaves(err)) < 1e-5
    # early in training the EMA hugs the (fast-moving) live params: decay ~0
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.ema_params, state.params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-2


def test_one_cycle_lr_schedule_shape():
    from litepi_tpu.train.detector import make_lr_schedule

    sched = make_lr_schedule(0.01, total_steps=1000, warmup_steps=100)
    assert float(sched(0)) == pytest.approx(0.001, rel=1e-3)   # lr/10
    assert float(sched(100)) == pytest.approx(0.01, rel=1e-3)  # peak
    assert float(sched(1000)) == pytest.approx(1e-4, rel=1e-2) # lr*0.01
    # monotone decay after warmup
    vals = [float(sched(t)) for t in range(100, 1001, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["yolov5u", "yolov11"])
def test_baseline_models_train_under_tal_loss(variant):
    """v11n and the anchor-free v5u share the {reg, cls} contract, so the
    TAL train step covers baseline fine-tuning (reference trains all its
    baselines — train-model-tsd-*.ipynb).  cfg supplies only the grid."""
    if variant == "yolov5u":
        from litepi_tpu.models.yolov5 import YoloV5

        model = YoloV5(num_classes=1, width=0.125, anchor_free=True)
    else:
        from litepi_tpu.models.yolov11 import YoloV11

        model = YoloV11(num_classes=1, width=0.125)

    _, state, tx = create_detector_train_state(TINY, model=model)
    step = jax.jit(
        functools.partial(detector_train_step, model, tx, cfg=TINY)
    )
    batch = _tiny_batch(np.random.default_rng(3))
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
