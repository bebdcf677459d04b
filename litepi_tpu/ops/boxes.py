"""Box coordinate math, shared by decode, NMS, ROI extraction and eval.

The reference re-implements these as numpy helpers in every script
(reference: e2e.py:266-278 xywh->xyxy + un-letterbox; e2e.py:663-676 IoU
matrix).  Here they are single vectorised JAX functions usable both inside
jitted programs and (via numpy duck-typing of jnp) in host-side eval code.
All functions take boxes in ``(..., 4)`` layout.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6  # the reference's IoU denominator epsilon (e2e.py:106-117)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    half_w, half_h = w * 0.5, h * 0.5
    return jnp.concatenate(
        [cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1
    )


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, clamped at zero."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix between xyxy boxes ``a`` (..., M, 4) and ``b``
    (..., N, 4) -> (..., M, N).  Uses the reference's +eps denominator."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + EPS)


def unletterbox_boxes(
    boxes: jnp.ndarray,
    ratio: float,
    dw: float,
    dh: float,
    orig_w: int,
    orig_h: int,
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed 640-space back to original pixels and
    clip, mirroring the reference postprocess (e2e.py:266-278)."""
    x1 = (boxes[..., 0] - dw) / ratio
    y1 = (boxes[..., 1] - dh) / ratio
    x2 = (boxes[..., 2] - dw) / ratio
    y2 = (boxes[..., 3] - dh) / ratio
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return clip_boxes(out, orig_w, orig_h)


def clip_boxes(boxes: jnp.ndarray, w, h) -> jnp.ndarray:
    """Clip xyxy boxes to [0, w] x [0, h].  ``w``/``h`` may be scalars or
    broadcastable arrays (per-image sizes in a batch)."""
    w = jnp.asarray(w, dtype=boxes.dtype)
    h = jnp.asarray(h, dtype=boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
