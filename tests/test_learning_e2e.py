"""End-to-end learning sanity: training a tiny detector on synthetic boxes
must reach non-trivial val mAP through the full stack (TAL/CIoU/DFL loss ->
decode -> NMS -> matcher -> mAP).  This is the framework's strongest
correctness test: any sign error, mis-assignment or decode/eval mismatch
keeps mAP at ~0.

Reference analog: the notebooks' train-then-val loop
(train-yolo-custom-tt100k.ipynb cell 36) — here reduced to a one-minute
synthetic problem.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litepi_tpu.core.types import DetectorConfig
from litepi_tpu.evals.map import evaluate_predictions
from litepi_tpu.ops.anchors import make_anchors
from litepi_tpu.ops.dfl import decode_boxes, dfl_decode
from litepi_tpu.ops.nms import nms_sorted
from litepi_tpu.train.detector import (
    create_detector_train_state,
    detector_train_step,
)

S = 128


def _make_sample(rng):
    img = rng.uniform(0, 0.35, (S, S, 3)).astype(np.float32)
    boxes = []
    for _ in range(int(rng.integers(1, 3))):
        w, h = rng.integers(20, 48, 2)
        x1 = int(rng.integers(0, S - w))
        y1 = int(rng.integers(0, S - h))
        img[y1 : y1 + h, x1 : x1 + w] = rng.uniform(0.8, 1.0)
        boxes.append([x1, y1, x1 + w, y1 + h])
    return img, np.asarray(boxes, np.float32)


def _batch(samples, idxs, max_gt=4):
    b = len(idxs)
    out = {
        "images": np.zeros((b, S, S, 3), np.float32),
        "gt_boxes": np.zeros((b, max_gt, 4), np.float32),
        "gt_labels": np.zeros((b, max_gt), np.int32),
        "gt_mask": np.zeros((b, max_gt), bool),
    }
    for i, j in enumerate(idxs):
        img, boxes = samples[j]
        out["images"][i] = img
        n = min(len(boxes), max_gt)
        out["gt_boxes"][i, :n] = boxes[:n]
        out["gt_mask"][i, :n] = True
    return out


@pytest.mark.slow
def test_detector_learns_synthetic_boxes():
    rng = np.random.default_rng(0)
    cfg = DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=S
    )
    train = [_make_sample(rng) for _ in range(64)]
    val = [_make_sample(rng) for _ in range(12)]

    model, state, tx = create_detector_train_state(
        cfg, lr=5e-3, dtype=jnp.float32
    )
    step = jax.jit(functools.partial(detector_train_step, model, tx))
    first_loss = None
    for it in range(200):
        state, m = step(state, _batch(train, rng.integers(0, len(train), 8)))
        if first_loss is None:
            first_loss = float(m["loss"])
    assert float(m["loss"]) < 0.05 * first_loss

    pts, strides = make_anchors(S, cfg.strides)
    pts, strides = jnp.asarray(pts), jnp.asarray(strides)

    @jax.jit
    def detect(variables, imgs):
        out = model.apply(variables, imgs, train=False)
        probs = jax.nn.sigmoid(out["cls"].astype(jnp.float32))
        scores = probs.max(-1)
        cls = probs.argmax(-1).astype(jnp.int32)
        top_s, idx = jax.lax.top_k(scores, 64)
        reg = jnp.take_along_axis(
            out["reg"].astype(jnp.float32), idx[..., None], axis=1
        )
        boxes = decode_boxes(
            dfl_decode(reg, cfg.reg_max), pts[idx], strides[idx], xywh=False
        )
        # low eval conf: the mAP pass cares about ranking, not the operating
        # point (mirrors the reference's yolo_conf=0.001 pass)
        return nms_sorted(
            boxes, top_s, jnp.take_along_axis(cls, idx, axis=1), 0.05, 0.45, 8
        )

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    b, s, c, v = map(
        np.asarray, detect(variables, np.stack([x[0] for x in val]))
    )
    preds, gts = [], []
    for i in range(len(val)):
        keep = v[i]
        preds.append((b[i][keep], s[i][keep], c[i][keep].astype(np.int32)))
        gts.append((val[i][1], np.zeros(len(val[i][1]), np.int32)))
    metrics = evaluate_predictions(preds, gts, 1)
    # random init scores ~0; a working stack clears 0.3 easily (typ. ~0.7+)
    assert metrics["mAP50"] > 0.3, metrics
