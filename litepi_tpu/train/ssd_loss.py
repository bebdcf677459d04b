"""SSD multibox loss: matched-anchor smooth-L1 + hard-negative-mined CE.

The reference trains SSD300 through torchvision's built-in loss (reference:
train-other-model-tsd-*.ipynb cell 13).  This is the same formulation as
fixed-shape vectorized JAX: match default boxes to padded ground truth
(IoU >= 0.5, plus best-box-per-gt forcing), encode offsets with variances
(0.1, 0.2), smooth-L1 on positives, cross-entropy with 3:1 hard-negative
mining, normalised by the positive count.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from litepi_tpu.ops.boxes import box_iou, xyxy_to_xywh


def encode_boxes(
    gt_xyxy: jnp.ndarray,  # (..., N, 4)
    defaults_cxcywh: jnp.ndarray,  # (N, 4)
    variances: Tuple[float, float] = (0.1, 0.2),
) -> jnp.ndarray:
    g = xyxy_to_xywh(gt_xyxy)
    d_cx, d_cy, d_w, d_h = (defaults_cxcywh[..., i] for i in range(4))
    t_cx = (g[..., 0] - d_cx) / (d_w * variances[0])
    t_cy = (g[..., 1] - d_cy) / (d_h * variances[0])
    t_w = jnp.log(jnp.maximum(g[..., 2], 1e-6) / d_w) / variances[1]
    t_h = jnp.log(jnp.maximum(g[..., 3], 1e-6) / d_h) / variances[1]
    return jnp.stack([t_cx, t_cy, t_w, t_h], axis=-1)


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    a = jnp.abs(x)
    return jnp.where(a < 1.0, 0.5 * x * x, a - 0.5)


def multibox_loss(
    out: Dict[str, jnp.ndarray],  # loc (B,N,4), conf (B,N,C+1)
    default_boxes_xyxy: jnp.ndarray,  # (N, 4) xyxy pixels
    default_boxes_cxcywh: jnp.ndarray,  # (N, 4)
    gt_boxes: jnp.ndarray,  # (B, G, 4) xyxy, padded
    gt_labels: jnp.ndarray,  # (B, G) in [0, C): foreground labels
    gt_mask: jnp.ndarray,  # (B, G)
    iou_threshold: float = 0.5,
    neg_pos_ratio: int = 3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    loc, conf = out["loc"], out["conf"]
    B, N = conf.shape[0], conf.shape[1]

    iou = box_iou(gt_boxes, default_boxes_xyxy[None])  # (B, G, N)
    iou = jnp.where(gt_mask[..., None], iou, -1.0)

    best_gt_iou = iou.max(axis=1)  # (B, N)
    best_gt_idx = iou.argmax(axis=1)  # (B, N)
    # force: every gt claims its single best default box
    best_db_for_gt = iou.argmax(axis=2)  # (B, G)
    forced = jnp.zeros((B, N), bool)
    batch_idx = jnp.arange(B)[:, None]
    forced = forced.at[batch_idx, best_db_for_gt].set(gt_mask)
    forced_gt = jnp.zeros((B, N), jnp.int32).at[batch_idx, best_db_for_gt].set(
        jnp.where(gt_mask, jnp.arange(gt_boxes.shape[1])[None, :], 0)
    )
    positive = (best_gt_iou >= iou_threshold) | forced
    assigned_gt = jnp.where(forced, forced_gt, best_gt_idx)  # (B, N)

    tgt_boxes = jnp.take_along_axis(gt_boxes, assigned_gt[..., None], 1)
    tgt_labels = jnp.take_along_axis(gt_labels, assigned_gt, 1) + 1  # bg=0
    tgt_labels = jnp.where(positive, tgt_labels, 0)

    # localisation: smooth L1 on positives
    enc = encode_boxes(tgt_boxes, default_boxes_cxcywh)
    loc_l = _smooth_l1(loc - enc).sum(-1)
    num_pos = jnp.maximum(positive.sum(), 1)
    loss_loc = jnp.where(positive, loc_l, 0.0).sum() / num_pos

    # classification with hard-negative mining (3:1 per image)
    logp = jax.nn.log_softmax(conf, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_labels[..., None], -1)[..., 0]  # (B,N)
    neg_ce = jnp.where(positive, -jnp.inf, ce)
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1)  # rank of each box among negatives
    num_pos_img = positive.sum(axis=1, keepdims=True)
    num_neg_img = jnp.minimum(neg_pos_ratio * num_pos_img, N - num_pos_img)
    hard_neg = (rank < num_neg_img) & ~positive
    loss_cls = jnp.where(positive | hard_neg, ce, 0.0).sum() / num_pos

    total = loss_loc + loss_cls
    return total, {
        "loss_loc": loss_loc,
        "loss_cls": loss_cls,
        "num_pos": positive.sum(),
    }
