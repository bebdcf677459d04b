"""YOLOv5n baseline detector in Flax (NHWC) — u-variant and classic heads.

The reference retrains and benchmarks YOLOv5n alongside v8n/v11n and the
custom model (reference: README.md:39, train-model-tsd-*.ipynb).  Its
DEPLOYED artifact is the **v5u** form: Ultralytics 8.x maps yolov5n to the
v5 backbone/neck with the anchor-FREE v8 DFL Detect head — confirmed
against the shipped export (src/tt100k/convert/model/yolo5/yolo5_ncnn_model/
model.ncnn.param: head convs (64,·,3)x2 + 1x1 per branch and the 16-bin
DFL conv_77, no 3-prior 1x1 heads).  ``anchor_free=True`` (the e2e/bench
default for variant 'yolov5n') builds exactly that graph; the classic
anchor-BASED head (3 priors/cell, v5 sigmoid decode

    xy = (2*sigmoid(t_xy) - 0.5 + grid) * stride
    wh = (2*sigmoid(t_wh))^2 * anchor_prior

) remains available as ``anchor_free=False`` ('yolov5n_legacy') together
with its anchor-based loss (train/yolov5_loss.py).

Shared architecture (v6.0 yaml at width 0.25 / depth 0.33): 6x6/2 stem
conv, Conv+C3 stages with repeats (1,2,3,1), SPPF, PAN neck with 1x1
pre-upsample reduces and C3 blocks.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from litepi_tpu.core.types import make_divisible, scale_depth
from litepi_tpu.models.layers import ConvBN, SPPF, upsample2x_nearest

# COCO-default v5 anchor priors, per level P3/P4/P5, in input pixels
V5_ANCHORS: Tuple[Tuple[Tuple[float, float], ...], ...] = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


class BottleneckV5(nn.Module):
    """C3's inner block: 1x1 then 3x3 at FULL width (e=1.0 — Ultralytics
    C3 passes e=1.0 to its bottlenecks; export-verified, the shipped yolo5
    graph shows (16,16,1)+(16,16,3) pairs, model.ncnn.param conv_5/6)."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = ConvBN(self.features, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3(nn.Module):
    """v5's CSP block: two parallel 1x1 projections, one through ``n``
    bottlenecks, concat, 1x1 fuse."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        hidden = self.features // 2
        a = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = BottleneckV5(hidden, self.shortcut, self.dtype, name=f"m{i}")(
                a, train
            )
        b = ConvBN(hidden, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv3")(y, train)


class YoloV5(nn.Module):
    """YOLOv5 detector; default scales give v5n.

    ``anchor_free=True`` = the u-variant (v8 DFL head, ``{reg, cls}``
    output contract shared with YoloLitePi — decode/NMS/eval/TAL loss all
    plug in); ``False`` = the classic 3-prior head (``{pred}`` contract,
    v5 decode + v5 loss)."""

    num_classes: int = 1
    width: float = 0.25
    depth: float = 0.33
    dtype: jnp.dtype = jnp.float32
    anchor_free: bool = False
    reg_max: int = 16

    @property
    def channels(self):
        return tuple(
            make_divisible(c * self.width) for c in (64, 128, 256, 512, 1024)
        )

    @nn.compact
    def __call__(self, x, train=False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        x = x.astype(dt)
        c = self.channels
        d = [scale_depth(n, self.depth) for n in (3, 6, 9, 3)]

        # backbone — the v5 yaml's stem is Conv(64, 6, 2, p=2), NOT autopad
        x = ConvBN(c[0], 6, 2, padding=2, dtype=dt, name="stem")(x, train)  # P1
        x = ConvBN(c[1], 3, 2, dtype=dt, name="down1")(x, train)  # P2
        x = C3(c[1], d[0], dtype=dt, name="c3_1")(x, train)
        x = ConvBN(c[2], 3, 2, dtype=dt, name="down2")(x, train)  # P3
        p3 = C3(c[2], d[1], dtype=dt, name="c3_2")(x, train)
        x = ConvBN(c[3], 3, 2, dtype=dt, name="down3")(p3, train)  # P4
        p4 = C3(c[3], d[2], dtype=dt, name="c3_3")(x, train)
        x = ConvBN(c[4], 3, 2, dtype=dt, name="down4")(p4, train)  # P5
        x = C3(c[4], d[3], dtype=dt, name="c3_4")(x, train)
        p5 = SPPF(c[4], 5, dtype=dt, name="sppf")(x, train)

        # PAN neck (v5 style: 1x1 reduce before upsample)
        t5 = ConvBN(c[3], 1, dtype=dt, name="td_cv5")(p5, train)
        t4 = jnp.concatenate([upsample2x_nearest(t5), p4], axis=-1)
        t4 = C3(c[3], d[0], shortcut=False, dtype=dt, name="td_p4")(t4, train)
        t4r = ConvBN(c[2], 1, dtype=dt, name="td_cv4")(t4, train)
        t3 = jnp.concatenate([upsample2x_nearest(t4r), p3], axis=-1)
        n3 = C3(c[2], d[0], shortcut=False, dtype=dt, name="td_p3")(t3, train)

        b4 = ConvBN(c[2], 3, 2, dtype=dt, name="bu_down3")(n3, train)
        n4 = C3(c[3], d[0], shortcut=False, dtype=dt, name="bu_p4")(
            jnp.concatenate([b4, t4r], axis=-1), train
        )
        b5 = ConvBN(c[3], 3, 2, dtype=dt, name="bu_down4")(n4, train)
        n5 = C3(c[4], d[0], shortcut=False, dtype=dt, name="bu_p5")(
            jnp.concatenate([b5, t5], axis=-1), train
        )

        if self.anchor_free:
            # v5u: the v8 DFL Detect head (model.ncnn.param conv_59-76)
            c_reg = max(16, c[2] // 4, 4 * self.reg_max)
            c_cls = max(c[2], min(self.num_classes, 100))
            reg_out, cls_out = [], []
            for i, f in enumerate((n3, n4, n5)):
                r = ConvBN(c_reg, 3, dtype=dt, name=f"reg{i}_cv1")(f, train)
                r = ConvBN(c_reg, 3, dtype=dt, name=f"reg{i}_cv2")(r, train)
                r = nn.Conv(
                    4 * self.reg_max, (1, 1), dtype=dt, name=f"reg{i}_out"
                )(r)
                k = ConvBN(c_cls, 3, dtype=dt, name=f"cls{i}_cv1")(f, train)
                k = ConvBN(c_cls, 3, dtype=dt, name=f"cls{i}_cv2")(k, train)
                k = nn.Conv(
                    self.num_classes, (1, 1), dtype=dt, name=f"cls{i}_out"
                )(k)
                b = f.shape[0]
                reg_out.append(r.reshape(b, -1, 4 * self.reg_max))
                cls_out.append(k.reshape(b, -1, self.num_classes))
            return {
                "reg": jnp.concatenate(reg_out, 1),
                "cls": jnp.concatenate(cls_out, 1),
            }

        # classic anchor-based head: 3 priors x (4 + 1 + nc) per cell, 1x1
        no = 3 * (5 + self.num_classes)
        outs = []
        for i, f in enumerate((n3, n4, n5)):
            y = nn.Conv(no, (1, 1), dtype=dt, name=f"head{i}")(f)
            b = y.shape[0]
            outs.append(
                y.reshape(b, -1, 3, 5 + self.num_classes).astype(jnp.float32)
            )
        # (B, A_total, 5 + nc): anchor-major within each cell, P3..P5 concat
        return {"pred": jnp.concatenate(outs, axis=1).reshape(
            outs[0].shape[0], -1, 5 + self.num_classes
        )}


def v5_anchor_table(
    input_size: int = 640,
    strides: Sequence[int] = (8, 16, 32),
    anchors=V5_ANCHORS,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-prediction (grid_xy, stride, anchor_wh) tables matching the head's
    flatten order: cells row-major, 3 priors per cell, P3..P5."""
    grids, strides_out, priors = [], [], []
    for s, level_anchors in zip(strides, anchors):
        n = input_size // s
        xs = np.arange(n, dtype=np.float32)
        gx, gy = np.meshgrid(xs, xs)
        cell_xy = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (n*n, 2)
        cell_xy = np.repeat(cell_xy, 3, axis=0)  # 3 priors per cell
        grids.append(cell_xy)
        strides_out.append(np.full((n * n * 3, 1), float(s), np.float32))
        priors.append(
            np.tile(np.asarray(level_anchors, np.float32), (n * n, 1))
        )
    return (
        np.concatenate(grids),
        np.concatenate(strides_out),
        np.concatenate(priors),
    )


def decode_v5(
    pred: jnp.ndarray,  # (B, A, 5 + nc) raw
    grid_xy: jnp.ndarray,  # (A, 2)
    strides: jnp.ndarray,  # (A, 1)
    anchor_wh: jnp.ndarray,  # (A, 2)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """v5 sigmoid decode -> (boxes xyxy pixels, scores, class_ids).
    score = objectness * class probability."""
    p = jax.nn.sigmoid(pred)
    xy = (2.0 * p[..., 0:2] - 0.5 + grid_xy) * strides
    wh = (2.0 * p[..., 2:4]) ** 2 * anchor_wh
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    cls_prob = p[..., 5:] * p[..., 4:5]
    return boxes, cls_prob.max(-1), cls_prob.argmax(-1).astype(jnp.int32)


def v5_candidates(
    pred: jnp.ndarray,  # (B, A, 5 + nc) raw head output
    grid_xy: jnp.ndarray,
    strides: jnp.ndarray,
    anchor_wh: jnp.ndarray,
    k: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-``k`` score-descending v5 candidates (decode only the selected
    anchors — same top-k-before-box-math layout rule as the anchor-free
    path, ops/dfl.py::decode_candidates).

    Returns (boxes (B, K, 4) xyxy pixels, scores (B, K), class_ids (B, K)).
    """
    obj = jax.nn.sigmoid(pred[..., 4].astype(jnp.float32))
    cls_p = jax.nn.sigmoid(pred[..., 5:].astype(jnp.float32))
    scores = cls_p.max(-1) * obj
    class_ids = cls_p.argmax(-1).astype(jnp.int32)
    k = min(k, scores.shape[-1])
    top_scores, idx = jax.lax.top_k(scores, k)
    sel = jnp.take_along_axis(pred[..., :4].astype(jnp.float32), idx[..., None], 1)
    p = jax.nn.sigmoid(sel)
    xy = (2.0 * p[..., 0:2] - 0.5 + grid_xy[idx]) * strides[idx]
    wh = (2.0 * p[..., 2:4]) ** 2 * anchor_wh[idx]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    cls_top = jnp.take_along_axis(class_ids, idx, axis=1)
    return boxes, top_scores, cls_top
