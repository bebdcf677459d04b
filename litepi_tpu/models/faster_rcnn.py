"""Faster R-CNN (ResNet50-FPN) baseline in Flax — fixed-shape throughout.

The reference trains torchvision's ``fasterrcnn_resnet50_fpn`` as its
two-stage baseline (reference: train-other-model-tsd-*.ipynb cell 11 —
R50-FPN with a swapped box-predictor head, SGD 1e-4; benchmarked at 0.18 FPS
on the Pi, Eval/detect_eval_results_fps_rcnn_ssd.csv:2).  This re-derives the
architecture with XLA-friendly static shapes:

* ResNet-50 C2..C5 -> FPN P2..P6 (256 ch),
* RPN: shared 3x3 head, 3 anchors/cell over 5 levels; proposals = top-K
  objectness -> delta decode -> clip -> greedy NMS (fixed budgets,
  ``suppress_sorted`` reused from ops/nms.py),
* RoIAlign: 14x14 bilinear samples averaged 2x2 -> 7x7, sampled from a
  zero-padded level pyramid with per-ROI FPN level assignment
  (k = floor(2 + log2(sqrt(area)/224))),
* box head: 2x FC-1024, class logits (nc+1) and per-class box deltas.

Everything is a baseline-capability model: the serving path remains the
one-stage fused pipeline.  Losses live in train/frcnn_loss.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from litepi_tpu.models.layers import upsample2x_nearest
from litepi_tpu.models.resnet import ResNet50Backbone
from litepi_tpu.ops.boxes import clip_boxes
from litepi_tpu.ops.nms import suppress_sorted

FPN_STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)


def rpn_anchors(input_size: int) -> np.ndarray:
    """(A_total, 4) xyxy anchors over P2..P6, 3 ratios per cell."""
    out = []
    for stride, size in zip(FPN_STRIDES, ANCHOR_SIZES):
        n = input_size // stride
        xs = (np.arange(n, dtype=np.float32) + 0.5) * stride
        cx, cy = np.meshgrid(xs, xs)
        cx, cy = cx.reshape(-1), cy.reshape(-1)
        for r in ANCHOR_RATIOS:
            w = size * np.sqrt(1.0 / r)
            h = size * np.sqrt(r)
            out.append(
                np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
            )
    # per-level blocks of (cells x 3 ratios): keep ratio-major within level
    blocks = []
    i = 0
    for stride in FPN_STRIDES:
        n = (input_size // stride) ** 2
        level = np.stack(out[i : i + 3], axis=1).reshape(-1, 4)  # cell-major
        blocks.append(level)
        i += 3
    return np.concatenate(blocks).astype(np.float32)


def decode_deltas(
    deltas: jnp.ndarray, boxes: jnp.ndarray, clip: float = 4.135
) -> jnp.ndarray:
    """(dx, dy, dw, dh) deltas applied to xyxy boxes -> xyxy."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + w / 2
    cy = boxes[..., 1] + h / 2
    ncx = deltas[..., 0] * w + cx
    ncy = deltas[..., 1] * h + cy
    nw = jnp.exp(jnp.clip(deltas[..., 2], -clip, clip)) * w
    nh = jnp.exp(jnp.clip(deltas[..., 3], -clip, clip)) * h
    return jnp.stack(
        [ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2], axis=-1
    )


def encode_deltas(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-3)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-3)
    acx = anchors[..., 0] + aw / 2
    acy = anchors[..., 1] + ah / 2
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-3)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-3)
    gcx = gt[..., 0] + gw / 2
    gcy = gt[..., 1] + gh / 2
    return jnp.stack(
        [
            (gcx - acx) / aw,
            (gcy - acy) / ah,
            jnp.log(gw / aw),
            jnp.log(gh / ah),
        ],
        axis=-1,
    )


class FPN(nn.Module):
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        dt = self.dtype
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=dt, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            outs.insert(0, lat + upsample2x_nearest(outs[0]))
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=dt, name=f"post{i}",
            )(o)
            for i, o in enumerate(outs)
        ]
        # P6: stride-2 max pool of P5
        outs.append(
            nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        )
        return outs


class RPNHead(nn.Module):
    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(
            256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )
        obj_head = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="obj")
        box_head = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype, name="box"
        )
        objs, boxes = [], []
        for f in feats:
            t = nn.relu(conv(f))
            b = t.shape[0]
            objs.append(obj_head(t).reshape(b, -1))
            boxes.append(box_head(t).reshape(b, -1, 4))
        return (
            jnp.concatenate(objs, 1).astype(jnp.float32),
            jnp.concatenate(boxes, 1).astype(jnp.float32),
        )


def roi_align(
    pyramid: jnp.ndarray,  # (L, Hmax, Wmax, C) zero-padded levels (P2..P5)
    rois: jnp.ndarray,  # (R, 4) xyxy image pixels
    valid: jnp.ndarray,  # (R,)
    out_size: int = 7,
    sampling: int = 2,
    canonical_level: int = 0,  # index of the stride-4 level in `pyramid`
) -> jnp.ndarray:
    """FPN RoIAlign: per-ROI level assignment + bilinear sampling.

    Returns (R, out_size, out_size, C).  aligned=False convention
    (feature-pixel centres at integer coordinates), sampling^2 points per bin
    averaged.
    """
    n_levels = pyramid.shape[0]
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    area = jnp.maximum(w * h, 1e-6)
    # torchvision: k = floor(4 + log2(sqrt(area)/224)), P2..P5 = k 2..5;
    # as a 0-based index into the pyramid: floor(2 + log2(sqrt(area)/224))
    k = jnp.floor(2.0 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-9))
    level = jnp.clip(k, 0, n_levels - 1).astype(jnp.int32)
    stride = (4.0 * (2.0 ** level.astype(jnp.float32)))[:, None]  # (R,1)

    s = out_size * sampling
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    x = rois[:, 0:1] / stride + frac[None, :] * (w[:, None] / stride)  # (R,s)
    y = rois[:, 1:2] / stride + frac[None, :] * (h[:, None] / stride)

    hmax, wmax = pyramid.shape[1], pyramid.shape[2]
    # clamp into the level's real extent (levels live top-left in the pad)
    lv_h = (hmax / (2.0 ** level.astype(jnp.float32)))[:, None]
    x = jnp.clip(x, 0.0, lv_h - 1.0)
    y = jnp.clip(y, 0.0, lv_h - 1.0)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, (lv_h - 1).astype(jnp.int32))
    y1 = jnp.minimum(y0 + 1, (lv_h - 1).astype(jnp.int32))
    fx = x - x0
    fy = y - y0

    lvl = level[:, None, None]

    def gather(yi, xi):
        return pyramid[lvl, yi[:, :, None], xi[:, None, :]]  # (R, s, s, C)

    top = gather(y0, x0) * (1 - fx)[:, None, :, None] + gather(y0, x1) * fx[
        :, None, :, None
    ]
    bot = gather(y1, x0) * (1 - fx)[:, None, :, None] + gather(y1, x1) * fx[
        :, None, :, None
    ]
    samples = top * (1 - fy)[:, :, None, None] + bot * fy[:, :, None, None]
    r, _, _, c = samples.shape
    pooled = samples.reshape(r, out_size, sampling, out_size, sampling, c).mean(
        axis=(2, 4)
    )
    return jnp.where(valid[:, None, None, None], pooled, 0.0)


class BoxHead(nn.Module):
    num_classes: int  # foreground classes; background added
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        r = pooled.shape[0]
        x = pooled.reshape(r, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc2")(x))
        nc1 = self.num_classes + 1
        cls = nn.Dense(nc1, dtype=jnp.float32, name="cls")(x)
        reg = nn.Dense(nc1 * 4, dtype=jnp.float32, name="reg")(x)
        return cls, reg.reshape(r, nc1, 4)


class FasterRCNN(nn.Module):
    """Faster R-CNN with fixed proposal budgets.

    ``__call__`` returns everything both training and inference need:
    RPN raw outputs + anchors-decoded proposals (post-NMS, padded) + box-head
    outputs on those proposals.
    """

    num_classes: int = 1
    input_size: int = 640
    pre_nms_topk: int = 1024
    post_nms_topk: int = 256
    rpn_nms_iou: float = 0.7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        b = x.shape[0]
        feats = ResNet50Backbone(dtype=self.dtype, name="backbone")(x, train)
        pyramid = FPN(dtype=self.dtype, name="fpn")(feats)  # P2..P6
        obj, deltas = RPNHead(dtype=self.dtype, name="rpn")(pyramid)

        anchors = jnp.asarray(rpn_anchors(self.input_size))

        # proposals: top-K objectness -> decode -> clip -> NMS (per image)
        k = min(self.pre_nms_topk, obj.shape[1])
        top_obj, idx = jax.lax.top_k(obj, k)
        cand = decode_deltas(
            jnp.take_along_axis(deltas, idx[..., None], 1), anchors[idx]
        )
        cand = clip_boxes(cand, self.input_size, self.input_size)
        # drop degenerate boxes
        ok = (cand[..., 2] - cand[..., 0] > 1) & (cand[..., 3] - cand[..., 1] > 1)
        keep = suppress_sorted(
            cand, ok, jnp.zeros(cand.shape[:-1], jnp.int32), self.rpn_nms_iou
        )
        kept_scores = jnp.where(keep, top_obj, -jnp.inf)
        p_scores, sel = jax.lax.top_k(kept_scores, self.post_nms_topk)
        proposals = jnp.take_along_axis(cand, sel[..., None], 1)
        p_valid = jnp.isfinite(p_scores)
        proposals = jnp.where(p_valid[..., None], proposals, 0.0)

        # RoIAlign from a zero-padded P2..P5 pyramid
        hmax = pyramid[0].shape[1]
        padded = jnp.stack(
            [
                jnp.pad(
                    p,
                    (
                        (0, 0),
                        (0, hmax - p.shape[1]),
                        (0, hmax - p.shape[2]),
                        (0, 0),
                    ),
                )
                for p in pyramid[:4]
            ],
            axis=1,
        )  # (B, 4, hmax, hmax, C)

        def per_image(args):
            pyr, rois, val = args
            pooled = roi_align(pyr, rois, val)
            return pooled

        pooled = jax.lax.map(per_image, (padded, proposals, p_valid))
        r = self.post_nms_topk
        cls, reg = BoxHead(self.num_classes, dtype=self.dtype, name="box_head")(
            pooled.reshape(b * r, *pooled.shape[2:])
        )
        return {
            "rpn_obj": obj,
            "rpn_deltas": deltas,
            "anchors": anchors,
            "proposals": proposals,
            "proposal_scores": jnp.where(p_valid, p_scores, 0.0),
            "proposal_valid": p_valid,
            "roi_cls": cls.reshape(b, r, -1),
            "roi_reg": reg.reshape(b, r, self.num_classes + 1, 4),
        }


def postprocess_detections(
    out: Dict[str, jnp.ndarray],
    input_size: int,
    conf_threshold=0.05,
    iou_threshold=0.5,
    max_detections: int = 64,
):
    """Final detections from box-head outputs: per-class delta decode +
    softmax scores + class-aware NMS (fixed shape)."""
    probs = jax.nn.softmax(out["roi_cls"], axis=-1)[..., 1:]  # drop background
    scores = probs.max(-1)
    labels = probs.argmax(-1).astype(jnp.int32)
    nc1 = out["roi_reg"].shape[2]
    reg = jnp.take_along_axis(
        out["roi_reg"], (labels + 1)[..., None, None].astype(jnp.int32), 2
    )[:, :, 0, :]
    boxes = clip_boxes(
        decode_deltas(reg, out["proposals"]), input_size, input_size
    )
    scores = jnp.where(out["proposal_valid"], scores, 0.0)
    order = jnp.argsort(-scores, axis=-1)
    boxes = jnp.take_along_axis(boxes, order[..., None], 1)
    scores = jnp.take_along_axis(scores, order, 1)
    labels = jnp.take_along_axis(labels, order, 1)

    from litepi_tpu.ops.nms import nms_sorted

    return nms_sorted(
        boxes, scores, labels, conf_threshold, iou_threshold, max_detections,
        use_pallas=False,
    )
