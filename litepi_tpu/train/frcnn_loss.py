"""Faster R-CNN training losses, fixed-shape.

The reference trains torchvision's built-in losses (train-other-model-tsd-*
cell 11).  Same formulation here:

* **RPN**: anchors matched to gt at IoU >= 0.7 (plus forced best-anchor per
  gt), negatives < 0.3; random subsample of 256 anchors at <= 50% positive;
  BCE objectness + smooth-L1 on positive deltas.
* **ROI head**: proposals matched at IoU >= 0.5; subsample 128 at 25%
  positive; softmax CE over (nc+1) + smooth-L1 on the matched class's deltas.

Random subsampling stays fixed-shape via the uniform-keys + top-k trick.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from litepi_tpu.models.faster_rcnn import encode_deltas
from litepi_tpu.ops.boxes import box_iou
from litepi_tpu.train.losses import optax_sigmoid_bce
from litepi_tpu.train.ssd_loss import _smooth_l1


def subsample_mask(
    mask: jnp.ndarray, k: int, key: jnp.ndarray
) -> jnp.ndarray:
    """Keep at most ``k`` True entries of ``mask``, chosen uniformly, as a
    fixed-shape mask: rank eligible entries by random keys and keep the top k.
    """
    u = jax.random.uniform(key, mask.shape)
    scores = jnp.where(mask, u, -1.0)
    kth = jax.lax.top_k(scores, min(k, mask.shape[-1]))[0][..., -1:]
    return mask & (scores >= jnp.maximum(kth, 0.0))


def _match(
    gt_boxes: jnp.ndarray,  # (B, G, 4)
    gt_mask: jnp.ndarray,  # (B, G)
    boxes: jnp.ndarray,  # (B, N, 4) anchors or proposals
    pos_thr: float,
    neg_thr: float,
    force_best: bool,
):
    iou = box_iou(gt_boxes, boxes)  # (B, G, N)
    iou = jnp.where(gt_mask[..., None], iou, -1.0)
    best_iou = iou.max(1)
    best_gt = iou.argmax(1)
    pos = best_iou >= pos_thr
    if force_best:
        b_idx = jnp.arange(boxes.shape[0])[:, None]
        best_anchor = iou.argmax(2)  # (B, G)
        forced = jnp.zeros(best_iou.shape, bool).at[b_idx, best_anchor].set(
            gt_mask
        )
        pos = pos | forced
        # forced anchors adopt their gt
        forced_gt = jnp.zeros(best_gt.shape, jnp.int32).at[
            b_idx, best_anchor
        ].set(jnp.where(gt_mask, jnp.arange(gt_boxes.shape[1])[None], 0))
        best_gt = jnp.where(forced, forced_gt, best_gt)
    neg = (best_iou < neg_thr) & ~pos
    return pos, neg, best_gt


def rpn_loss(
    obj: jnp.ndarray,  # (B, A)
    deltas: jnp.ndarray,  # (B, A, 4)
    anchors: jnp.ndarray,  # (A, 4)
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    key: jnp.ndarray,
    batch_per_image: int = 256,
    pos_fraction: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    pos, neg, assigned = _match(
        gt_boxes, gt_mask, jnp.broadcast_to(anchors, (obj.shape[0], *anchors.shape)),
        0.7, 0.3, force_best=True,
    )
    k1, k2 = jax.random.split(key)
    n_pos = int(batch_per_image * pos_fraction)
    pos_s = subsample_mask(pos, n_pos, k1)
    neg_s = subsample_mask(neg, batch_per_image - n_pos, k2)
    sampled = pos_s | neg_s
    n_sampled = jnp.maximum(sampled.sum(), 1)

    bce = optax_sigmoid_bce(obj, pos_s.astype(obj.dtype))
    loss_obj = jnp.where(sampled, bce, 0.0).sum() / n_sampled

    tgt = jnp.take_along_axis(gt_boxes, assigned[..., None], 1)
    enc = encode_deltas(tgt, anchors)
    l1 = _smooth_l1(deltas - enc).sum(-1)
    loss_box = jnp.where(pos_s, l1, 0.0).sum() / n_sampled
    return loss_obj + loss_box, {
        "rpn_obj_loss": loss_obj,
        "rpn_box_loss": loss_box,
        "rpn_pos": pos_s.sum(),
    }


def roi_head_loss(
    roi_cls: jnp.ndarray,  # (B, R, nc+1)
    roi_reg: jnp.ndarray,  # (B, R, nc+1, 4)
    proposals: jnp.ndarray,  # (B, R, 4)
    proposal_valid: jnp.ndarray,  # (B, R)
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,  # (B, G) foreground in [0, nc)
    gt_mask: jnp.ndarray,
    key: jnp.ndarray,
    batch_per_image: int = 128,
    pos_fraction: float = 0.25,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    pos, neg, assigned = _match(
        gt_boxes, gt_mask, proposals, 0.5, 0.5, force_best=False
    )
    pos = pos & proposal_valid
    neg = neg & proposal_valid
    k1, k2 = jax.random.split(key)
    n_pos = int(batch_per_image * pos_fraction)
    pos_s = subsample_mask(pos, n_pos, k1)
    neg_s = subsample_mask(neg, batch_per_image - n_pos, k2)
    sampled = pos_s | neg_s
    n_sampled = jnp.maximum(sampled.sum(), 1)

    labels = jnp.take_along_axis(gt_labels, assigned, 1) + 1  # bg = 0
    labels = jnp.where(pos_s, labels, 0)
    logp = jax.nn.log_softmax(roi_cls, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
    loss_cls = jnp.where(sampled, ce, 0.0).sum() / n_sampled

    tgt = jnp.take_along_axis(gt_boxes, assigned[..., None], 1)
    enc = encode_deltas(tgt, proposals)
    reg = jnp.take_along_axis(
        roi_reg, labels[..., None, None].astype(jnp.int32), 2
    )[:, :, 0, :]
    l1 = _smooth_l1(reg - enc).sum(-1)
    n_pos_total = jnp.maximum(pos_s.sum(), 1)
    loss_box = jnp.where(pos_s, l1, 0.0).sum() / n_pos_total
    return loss_cls + loss_box, {
        "roi_cls_loss": loss_cls,
        "roi_box_loss": loss_box,
        "roi_pos": pos_s.sum(),
    }


def frcnn_loss(
    out: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    key: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined RPN + ROI-head loss from a FasterRCNN forward dict."""
    k1, k2 = jax.random.split(key)
    l_rpn, aux1 = rpn_loss(
        out["rpn_obj"], out["rpn_deltas"], out["anchors"],
        gt_boxes, gt_mask, k1,
    )
    l_roi, aux2 = roi_head_loss(
        out["roi_cls"], out["roi_reg"], out["proposals"],
        out["proposal_valid"], gt_boxes, gt_labels, gt_mask, k2,
    )
    return l_rpn + l_roi, {**aux1, **aux2}
