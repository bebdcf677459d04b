"""Detection loss: task-aligned assignment + CIoU + DFL + BCE.

The reference trains its detector through Ultralytics (reference:
train-yolo-custom-tt100k.ipynb cell 36 — ``YOLO(cfg).train(...)``), whose
v8DetectionLoss combines a TaskAlignedAssigner with CIoU box loss,
distribution-focal loss over the reg_max bins and BCE classification.  This
module re-derives that capability as fixed-shape vectorized JAX: ground truth
arrives padded to ``max_gt`` boxes with a mask, the assignment is a dense
(B, G, A) tensor program — no data-dependent shapes, fully jit/shard-able.

Default hyper-parameters follow the Ultralytics defaults the reference
trained with: topk 10, alpha 0.5, beta 6.0, loss weights box 7.5 / cls 0.5 /
dfl 1.5.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from litepi_tpu.ops.boxes import EPS
from litepi_tpu.ops.dfl import dfl_decode


def pairwise_iou_ciou(
    gt: jnp.ndarray, pred: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IoU and CIoU between gt (..., G, 4) and pred (..., A, 4) -> (..., G, A).

    CIoU = IoU - center_dist^2 / diag^2 - alpha * v, with v the aspect-ratio
    consistency term.
    """
    g = gt[..., :, None, :]
    p = pred[..., None, :, :]
    lt = jnp.maximum(g[..., :2], p[..., :2])
    rb = jnp.minimum(g[..., 2:], p[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_g = jnp.maximum(g[..., 2] - g[..., 0], 0) * jnp.maximum(g[..., 3] - g[..., 1], 0)
    area_p = jnp.maximum(p[..., 2] - p[..., 0], 0) * jnp.maximum(p[..., 3] - p[..., 1], 0)
    union = area_g + area_p - inter + EPS
    iou = inter / union

    # enclosing box diagonal
    c_lt = jnp.minimum(g[..., :2], p[..., :2])
    c_rb = jnp.maximum(g[..., 2:], p[..., 2:])
    c_wh = c_rb - c_lt
    c2 = c_wh[..., 0] ** 2 + c_wh[..., 1] ** 2 + EPS
    # center distance
    g_c = (g[..., :2] + g[..., 2:]) * 0.5
    p_c = (p[..., :2] + p[..., 2:]) * 0.5
    rho2 = jnp.sum((g_c - p_c) ** 2, axis=-1)

    g_w = jnp.maximum(g[..., 2] - g[..., 0], EPS)
    g_h = jnp.maximum(g[..., 3] - g[..., 1], EPS)
    p_w = jnp.maximum(p[..., 2] - p[..., 0], EPS)
    p_h = jnp.maximum(p[..., 3] - p[..., 1], EPS)
    v = (4 / jnp.pi**2) * (jnp.arctan(g_w / g_h) - jnp.arctan(p_w / p_h)) ** 2
    alpha = v / (v - iou + (1 + EPS))
    alpha = jax.lax.stop_gradient(alpha)
    ciou = iou - rho2 / c2 - alpha * v
    return iou, ciou


def task_aligned_assign(
    pred_scores: jnp.ndarray,  # (B, A, nc) sigmoid probabilities
    pred_boxes: jnp.ndarray,  # (B, A, 4) xyxy, pixel space
    anchor_centers: jnp.ndarray,  # (A, 2) pixel space
    gt_boxes: jnp.ndarray,  # (B, G, 4) xyxy pixel space, padded
    gt_labels: jnp.ndarray,  # (B, G) int32
    gt_mask: jnp.ndarray,  # (B, G) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> Dict[str, jnp.ndarray]:
    """Dense task-aligned assigner.

    Returns per-anchor targets: ``fg`` (B, A) bool, ``target_boxes`` (B, A, 4),
    ``target_labels`` (B, A), ``target_scores`` (B, A) — the normalised
    alignment score used to weight both cls and box losses.
    """
    B, A, nc = pred_scores.shape
    G = gt_boxes.shape[1]

    iou, _ = pairwise_iou_ciou(gt_boxes, pred_boxes)  # (B, G, A)
    iou = jnp.clip(iou, 0.0, 1.0)

    # classification score of each anchor for each gt's class
    labels = jnp.clip(gt_labels, 0, nc - 1)
    cls_score = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),  # (B, nc, A)
        labels[..., None],  # (B, G, 1)
        axis=1,
    )  # (B, G, A)

    align = (cls_score**alpha) * (iou**beta)

    # candidates: anchor centre strictly inside the gt box
    cx = anchor_centers[None, None, :, 0]
    cy = anchor_centers[None, None, :, 1]
    inside = (
        (cx > gt_boxes[..., 0:1])
        & (cx < gt_boxes[..., 2:3])
        & (cy > gt_boxes[..., 1:2])
        & (cy < gt_boxes[..., 3:4])
    )  # (B, G, A)
    candidate = inside & gt_mask[..., None]
    align = jnp.where(candidate, align, 0.0)

    # top-k per gt: keep anchors whose metric reaches the k-th largest
    # (align > 0 alone excludes non-candidates when fewer than k exist —
    # no epsilon floor: a fresh model's metrics are legitimately ~1e-12)
    kth = jax.lax.top_k(align, topk)[0][..., -1:]  # (B, G, 1)
    pos = candidate & (align >= kth) & (align > 0)

    # conflict resolution: anchor claimed by several gts goes to max-IoU gt
    claimed_iou = jnp.where(pos, iou, -1.0)
    assigned_gt = jnp.argmax(claimed_iou, axis=1)  # (B, A)
    fg = jnp.any(pos, axis=1)  # (B, A)

    take = functools.partial(jnp.take_along_axis, indices=assigned_gt[:, None, :], axis=1)
    tgt_iou = jnp.squeeze(take(iou), 1)  # (B, A)
    tgt_align = jnp.squeeze(take(align), 1)  # (B, A)
    tgt_boxes = jnp.take_along_axis(
        gt_boxes, assigned_gt[..., None], axis=1
    )  # (B, A, 4)
    tgt_labels = jnp.take_along_axis(gt_labels, assigned_gt, axis=1)  # (B, A)

    # normalise: score = align / max_align_per_gt * max_iou_per_gt
    pos_align = jnp.where(pos, align, 0.0)
    max_align = jnp.max(pos_align, axis=-1)  # (B, G)
    max_iou = jnp.max(jnp.where(pos, iou, 0.0), axis=-1)  # (B, G)
    norm = max_iou / (max_align + EPS)  # (B, G)
    norm_per_anchor = jnp.take_along_axis(norm, assigned_gt, axis=1)  # (B, A)
    target_scores = jnp.where(fg, tgt_align * norm_per_anchor, 0.0)

    return {
        "fg": fg,
        "target_boxes": tgt_boxes,
        "target_labels": jnp.where(fg, tgt_labels, 0),
        "target_scores": target_scores,
        "target_iou": tgt_iou,
    }


def dfl_loss(
    reg_logits: jnp.ndarray,  # (B, A, 4*reg_max)
    target_dist: jnp.ndarray,  # (B, A, 4) distances in grid units
    reg_max: int,
) -> jnp.ndarray:
    """Distribution focal loss: soft cross-entropy against the two integer
    bins bracketing each target distance.  Returns (B, A) per-anchor loss
    (mean over the 4 sides)."""
    t = jnp.clip(target_dist, 0.0, reg_max - 1.01)
    tl = jnp.floor(t)
    tr = tl + 1.0
    wl = tr - t
    wr = t - tl
    logits = reg_logits.reshape(*reg_logits.shape[:-1], 4, reg_max)
    logp = jax.nn.log_softmax(logits, axis=-1)
    l_tl = jnp.take_along_axis(logp, tl.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    l_tr = jnp.take_along_axis(logp, tr.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    return -(wl * l_tl + wr * l_tr).mean(axis=-1)


def detection_loss(
    out: Dict[str, jnp.ndarray],  # model output: reg (B,A,4R), cls (B,A,nc)
    anchors: jnp.ndarray,  # (A, 2) cell units
    strides: jnp.ndarray,  # (A, 1)
    gt_boxes: jnp.ndarray,  # (B, G, 4) xyxy pixel space, padded
    gt_labels: jnp.ndarray,  # (B, G)
    gt_mask: jnp.ndarray,  # (B, G)
    reg_max: int = 16,
    w_box: float = 7.5,
    w_cls: float = 0.5,
    w_dfl: float = 1.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full detection loss.  Returns (scalar_loss, aux dict)."""
    reg_logits = out["reg"].astype(jnp.float32)
    cls_logits = out["cls"].astype(jnp.float32)
    B, A, nc = cls_logits.shape

    dist = dfl_decode(reg_logits, reg_max)  # (B, A, 4) grid units
    centers_px = anchors * strides  # (A, 2)
    lt = (anchors - dist[..., :2]) * strides
    rb = (anchors + dist[..., 2:]) * strides
    pred_boxes = jnp.concatenate([lt, rb], axis=-1)  # (B, A, 4) pixels

    probs = jax.nn.sigmoid(cls_logits)
    assign = task_aligned_assign(
        probs, jax.lax.stop_gradient(pred_boxes), centers_px,
        gt_boxes, gt_labels, gt_mask,
    )
    fg = assign["fg"]
    tscores = assign["target_scores"]
    tsum = jnp.maximum(tscores.sum(), 1.0)

    # classification: BCE against the aligned soft targets over all anchors
    onehot = jax.nn.one_hot(assign["target_labels"], nc, dtype=cls_logits.dtype)
    cls_target = onehot * tscores[..., None]
    bce = optax_sigmoid_bce(cls_logits, cls_target)
    loss_cls = bce.sum() / tsum

    # box: CIoU on foreground anchors, weighted by the aligned score
    _, ciou = pairwise_iou_ciou(
        assign["target_boxes"][:, :, None, :], pred_boxes[:, :, None, :]
    )
    ciou = ciou[..., 0, 0]  # (B, A) — paired, not cross
    loss_box = (jnp.where(fg, (1.0 - ciou) * tscores, 0.0)).sum() / tsum

    # dfl: distances from anchor centre to target box edges, grid units
    tb = assign["target_boxes"] / strides  # grid units
    a = anchors[None]
    tdist = jnp.concatenate(
        [a - tb[..., :2], tb[..., 2:] - a], axis=-1
    )  # (B, A, 4) = (l, t, r, b)
    per_anchor_dfl = dfl_loss(reg_logits, tdist, reg_max)
    loss_dfl = (jnp.where(fg, per_anchor_dfl * tscores, 0.0)).sum() / tsum

    total = w_box * loss_box + w_cls * loss_cls + w_dfl * loss_dfl
    aux = {
        "loss_box": loss_box,
        "loss_cls": loss_cls,
        "loss_dfl": loss_dfl,
        "num_fg": fg.sum(),
    }
    return total, aux


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise binary cross-entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
