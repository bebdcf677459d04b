"""YOLOv5 (anchor-based) training loss, fixed-shape.

Completes training coverage for the v5 baseline family (the anchor-free
family trains via train/losses.py TAL).  Follows the Ultralytics v5 recipe
the reference's baselines were trained with:

* **target building**: a gt matches a prior when max(r, 1/r) < 4 with
  r = gt_wh / anchor_wh, replicated to the centre cell plus the two nearest
  neighbour cells (the 0.5-offset rule) — here a dense bounded candidate
  tensor (B, G, levels*priors*3cells) with a validity mask instead of a
  ragged list;
* **box**: CIoU between the v5-decoded prediction at each matched slot and
  its gt, mean over matches;
* **objectness**: BCE over ALL anchors; positive anchors carry the
  (detached) CIoU as a soft target, with per-level balance (4.0, 1.0, 0.4);
* **cls**: BCE at matched slots;
* loss gains box 0.05 / obj 1.0 / cls 0.5.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from litepi_tpu.models.yolov5 import V5_ANCHORS
from litepi_tpu.train.losses import optax_sigmoid_bce, pairwise_iou_ciou

LEVEL_BALANCE = (4.0, 1.0, 0.4)


def _level_tables(input_size: int, strides=(8, 16, 32), anchors=V5_ANCHORS):
    """Static per-level metadata: grid size, flat offset, prior wh."""
    tables = []
    offset = 0
    for s, priors in zip(strides, anchors):
        n = input_size // s
        tables.append(
            {
                "stride": s,
                "n": n,
                "offset": offset,
                "priors": np.asarray(priors, np.float32),
            }
        )
        offset += n * n * 3
    return tables, offset


def build_targets(
    gt_boxes: jnp.ndarray,  # (B, G, 4) xyxy pixels
    gt_labels: jnp.ndarray,  # (B, G)
    gt_mask: jnp.ndarray,  # (B, G)
    input_size: int,
    anchor_t: float = 4.0,
) -> Dict[str, jnp.ndarray]:
    """Dense candidate targets.

    Returns per-candidate arrays of shape (B, G, C) with
    C = 3 levels * 3 priors * 3 cells: flat prediction index, validity,
    target xy offset (relative to the cell), target wh (pixels), prior wh,
    stride, and label.
    """
    tables, _ = _level_tables(input_size)
    B, G = gt_mask.shape
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) * 0.5
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) * 0.5
    w = gt_boxes[..., 2] - gt_boxes[..., 0]
    h = gt_boxes[..., 3] - gt_boxes[..., 1]

    idx_parts, valid_parts, txy_parts, twh_parts = [], [], [], []
    prior_parts, stride_parts, lvl_parts = [], [], []
    for li, t in enumerate(tables):
        s, n, off = t["stride"], t["n"], t["offset"]
        gx = cx / s
        gy = cy / s
        cell_x = jnp.floor(gx)
        cell_y = jnp.floor(gy)
        fx = gx - cell_x
        fy = gy - cell_y
        # neighbour selection: the closer side in each axis (v5 offset rule)
        nbr_dx = jnp.where(fx < 0.5, -1.0, 1.0)
        nbr_dy = jnp.where(fy < 0.5, -1.0, 1.0)
        cells = [
            (jnp.zeros_like(fx), jnp.zeros_like(fy)),
            (nbr_dx, jnp.zeros_like(fy)),
            (jnp.zeros_like(fx), nbr_dy),
        ]
        for pi in range(3):
            pw, ph = t["priors"][pi]
            r_w = w / pw
            r_h = h / ph
            ratio_ok = (
                jnp.maximum(
                    jnp.maximum(r_w, 1.0 / jnp.maximum(r_w, 1e-9)),
                    jnp.maximum(r_h, 1.0 / jnp.maximum(r_h, 1e-9)),
                )
                < anchor_t
            )
            for dx, dy in cells:
                ccx = cell_x + dx
                ccy = cell_y + dy
                inside = (ccx >= 0) & (ccx < n) & (ccy >= 0) & (ccy < n)
                ok = gt_mask & ratio_ok & inside
                flat = off + (ccy * n + ccx) * 3 + pi
                idx_parts.append(jnp.where(ok, flat, 0).astype(jnp.int32))
                valid_parts.append(ok)
                # xy target relative to the *assigned* cell, in [-0.5, 1.5]
                txy_parts.append(
                    jnp.stack([gx - ccx, gy - ccy], axis=-1)
                )
                twh_parts.append(jnp.stack([w, h], axis=-1))
                prior_parts.append(
                    jnp.broadcast_to(
                        jnp.asarray([pw, ph], jnp.float32), (B, G, 2)
                    )
                )
                stride_parts.append(jnp.full((B, G), float(s)))
                lvl_parts.append(jnp.full((B, G), li, jnp.int32))

    stack = lambda parts: jnp.stack(parts, axis=2)  # (B, G, C, ...)
    return {
        "index": stack(idx_parts),
        "valid": stack(valid_parts),
        "txy": stack(txy_parts),
        "twh": stack(twh_parts),
        "prior": stack(prior_parts),
        "stride": stack(stride_parts),
        "level": stack(lvl_parts),
        "label": jnp.broadcast_to(
            gt_labels[:, :, None], stack(valid_parts).shape
        ),
    }


def yolov5_loss(
    pred: jnp.ndarray,  # (B, A, 5 + nc) raw head output
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    input_size: int,
    w_box: float = 0.05,
    w_obj: float = 1.0,
    w_cls: float = 0.5,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    B, A, no = pred.shape
    nc = no - 5
    tgt = build_targets(gt_boxes, gt_labels, gt_mask, input_size)
    idx = tgt["index"].reshape(B, -1)  # (B, T)
    valid = tgt["valid"].reshape(B, -1)
    T = idx.shape[1]

    p = jnp.take_along_axis(pred, idx[..., None], axis=1)  # (B, T, 5+nc)
    sig = jax.nn.sigmoid(p)
    # v5 decode at the assigned cell
    pred_xy = 2.0 * sig[..., 0:2] - 0.5  # cell-relative
    prior = tgt["prior"].reshape(B, T, 2)
    stride = tgt["stride"].reshape(B, T)[..., None]
    pred_wh = (2.0 * sig[..., 2:4]) ** 2 * prior

    txy = tgt["txy"].reshape(B, T, 2)
    twh = tgt["twh"].reshape(B, T, 2)
    # boxes in a cell-local pixel frame for CIoU
    pb = jnp.concatenate(
        [pred_xy * stride - pred_wh / 2, pred_xy * stride + pred_wh / 2], -1
    )
    gb = jnp.concatenate(
        [txy * stride - twh / 2, txy * stride + twh / 2], -1
    )
    _, ciou = pairwise_iou_ciou(gb[:, :, None, :], pb[:, :, None, :])
    ciou = ciou[..., 0, 0]  # (B, T) paired
    n_pos = jnp.maximum(valid.sum(), 1)
    loss_box = (jnp.where(valid, 1.0 - ciou, 0.0)).sum() / n_pos

    # objectness: scatter-max detached IoU into per-anchor targets
    obj_tgt = jnp.zeros((B, A))
    iou_d = jax.lax.stop_gradient(jnp.clip(ciou, 0.0, 1.0))
    obj_tgt = obj_tgt.at[jnp.arange(B)[:, None], idx].max(
        jnp.where(valid, iou_d, 0.0)
    )
    obj_bce = optax_sigmoid_bce(pred[..., 4], obj_tgt)
    # per-level balance weights over the flat anchor dim
    tables, total = _level_tables(input_size)
    balance = np.zeros(total, np.float32)
    for t, b_ in zip(tables, LEVEL_BALANCE):
        balance[t["offset"] : t["offset"] + t["n"] ** 2 * 3] = b_
    loss_obj = (obj_bce * jnp.asarray(balance)[None]).mean()

    if nc > 1:
        onehot = jax.nn.one_hot(tgt["label"].reshape(B, T), nc)
        cls_bce = optax_sigmoid_bce(p[..., 5:], onehot).sum(-1)
        loss_cls = (jnp.where(valid, cls_bce, 0.0)).sum() / n_pos
    else:
        loss_cls = jnp.zeros(())

    total_loss = (w_box * loss_box + w_obj * loss_obj + w_cls * loss_cls) * B
    return total_loss, {
        "loss_box": loss_box,
        "loss_obj": loss_obj,
        "loss_cls": loss_cls,
        "num_matched": valid.sum(),
    }
