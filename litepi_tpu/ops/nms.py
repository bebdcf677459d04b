"""Non-maximum suppression: fixed-shape on-device, plus a numpy oracle.

The reference runs exact greedy per-class NMS in numpy after a confidence
filter, with a 1e-6 IoU epsilon and descending stable score order
(reference: e2e.py:89-119 ``nms_numpy``; per-class dispatch at :280-296).
That is a data-dependent-shape algorithm; under XLA everything must be static.

:func:`nms_fixed` keeps the exact greedy *semantics* on a static budget:

1. confidence filter -> top-``max_candidates`` candidates by score
   (``lax.top_k`` — candidates beyond the budget are the lowest-scoring tail,
   matching Ultralytics' max-det style capping),
2. per-class behaviour via an exact class-equality mask on the pairwise IoU
   matrix (cross-class pairs never suppress) — one pass covers all classes
   with no float-precision caveats (the classic coordinate-offset trick
   quantises box coordinates for large class ids; a mask is exact for any
   class count),
3. one K x K IoU matrix + a K-step masked greedy suppression scan: box *i* is
   kept iff no higher-scoring *kept* box overlaps it above the threshold —
   identical to the sequential greedy loop,
4. compact survivors into exactly ``max_detections`` padded slots.

:func:`nms_numpy_reference` is the golden oracle used by the tests — a fresh
implementation of the reference's algorithm contract.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from litepi_tpu.ops.boxes import box_iou


def nms_numpy_reference(
    boxes: np.ndarray, scores: np.ndarray, iou_threshold: float
) -> np.ndarray:
    """Exact greedy NMS oracle matching the reference contract
    (e2e.py:89-119): descending score order via ``argsort()[::-1]``, O(n^2)
    suppression, IoU denominator epsilon 1e-6.  Returns kept indices."""
    if boxes.size == 0:
        return np.zeros((0,), dtype=np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / (areas[i] + areas[rest] - inter + 1e-6)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, dtype=np.int64)


def suppress_sorted(
    cand_boxes: jnp.ndarray,
    cand_valid: jnp.ndarray,
    cand_cls: jnp.ndarray,
    iou_threshold,
) -> jnp.ndarray:
    """Exact greedy suppression over score-DESCENDING candidates (..., K, 4).

    Instead of a K-step sequential loop (latency-bound on TPU: each step is a
    tiny vector op), run the fixpoint iteration

        keep[i] <- valid[i] and no kept j < i with IoU(j, i) > thr

    which converges to exactly the greedy result in as many rounds as the
    longest suppression *chain* (typically 2-4 in real scenes, K worst case).
    Each round is one dense (K, K) masked any-reduction — VPU-friendly.
    Returns the keep mask (..., K).
    """
    k = cand_boxes.shape[-2]
    iou = box_iou(cand_boxes, cand_boxes)
    same_cls = cand_cls[..., :, None] == cand_cls[..., None, :]
    j_lt_i = (
        jnp.arange(k)[:, None] < jnp.arange(k)[None, :]
    )  # [j, i]: j is higher-scoring than i
    # j suppresses i (if j kept); cross-class pairs never suppress
    over = (iou > iou_threshold) & same_cls & j_lt_i

    def cond(carry):
        keep, prev, it = carry
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.any(over & keep[..., :, None], axis=-2)
        return cand_valid & ~suppressed, keep, it + 1

    init = (cand_valid, jnp.zeros_like(cand_valid), jnp.zeros((), jnp.int32))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def _nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    conf_threshold: float,
    iou_threshold: float,
    max_candidates: int,
    max_detections: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    num = boxes.shape[0]
    k = min(max_candidates, num)

    masked_scores = jnp.where(scores > conf_threshold, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    cand_boxes = boxes[top_idx]
    cand_cls = class_ids[top_idx]
    cand_valid = top_scores > conf_threshold

    keep = suppress_sorted(cand_boxes, cand_valid, cand_cls, iou_threshold)

    # Survivors are already score-sorted; compact the first max_detections.
    kept_scores = jnp.where(keep, top_scores, -1.0)
    if max_detections > k:  # tiny-input edge case: pad the candidate set
        pad = max_detections - k
        kept_scores = jnp.pad(kept_scores, (0, pad), constant_values=-1.0)
        cand_boxes = jnp.pad(cand_boxes, ((0, pad), (0, 0)))
        cand_cls = jnp.pad(cand_cls, (0, pad), constant_values=-1)
    out_scores, sel = jax.lax.top_k(kept_scores, max_detections)
    out_valid = out_scores > conf_threshold
    out_boxes = jnp.where(out_valid[:, None], cand_boxes[sel], 0.0)
    out_cls = jnp.where(out_valid, cand_cls[sel], -1)
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return out_boxes, out_scores, out_cls, out_valid


def nms_sorted(
    cand_boxes: jnp.ndarray,
    cand_scores: jnp.ndarray,
    cand_cls: jnp.ndarray,
    conf_threshold,
    iou_threshold,
    max_detections: int,
    use_pallas: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS over an already score-descending candidate set (..., K, 4).

    The fused pipeline top-k's scores *before* decoding boxes (so the full
    (A, 4) box tensor never materialises); this entry point skips the
    internal re-sort.  Same output contract as :func:`nms_fixed` with
    D = ``max_detections``.

    On TPU the suppression runs as a Pallas kernel (ops/pallas_nms.py:
    VMEM-resident IoU + MXU-matvec fixpoint — ~50x the XLA formulation);
    elsewhere the XLA fixpoint is used.  Both are greedy-exact.
    """
    cand_valid = cand_scores > conf_threshold
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from litepi_tpu.ops.pallas_nms import pallas_suppress

        squeeze = cand_boxes.ndim == 2
        bx = cand_boxes if not squeeze else cand_boxes[None]
        cl = cand_cls if not squeeze else cand_cls[None]
        planar = jnp.swapaxes(bx, -1, -2)
        v = cand_valid if not squeeze else cand_valid[None]
        keep = pallas_suppress(
            planar, cl.astype(jnp.float32)[:, None, :], v, iou_threshold
        )
        if squeeze:
            keep = keep[0]
    else:
        keep = suppress_sorted(cand_boxes, cand_valid, cand_cls, iou_threshold)
    kept_scores = jnp.where(keep, cand_scores, -1.0)
    k = cand_boxes.shape[-2]
    if max_detections > k:  # tiny-candidate-set edge case: pad
        pad = max_detections - k
        widths = [(0, 0)] * (cand_boxes.ndim - 2) + [(0, pad)]
        kept_scores = jnp.pad(kept_scores, widths, constant_values=-1.0)
        cand_boxes = jnp.pad(cand_boxes, widths + [(0, 0)])
        cand_cls = jnp.pad(cand_cls, widths, constant_values=-1)
    out_scores, sel = jax.lax.top_k(kept_scores, max_detections)
    out_valid = out_scores > conf_threshold
    out_boxes = jnp.where(
        out_valid[..., None], jnp.take_along_axis(cand_boxes, sel[..., None], -2), 0.0
    )
    out_cls = jnp.where(out_valid, jnp.take_along_axis(cand_cls, sel, -1), -1)
    return out_boxes, jnp.where(out_valid, out_scores, 0.0), out_cls, out_valid


@functools.partial(jax.jit, static_argnums=(5, 6))
def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    conf_threshold=0.25,
    iou_threshold=0.45,
    max_candidates: int = 512,
    max_detections: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape batched greedy NMS.

    Parameters
    ----------
    boxes : (B, A, 4) or (A, 4) xyxy
    scores : (B, A) or (A,)
    class_ids : same leading shape, int32
    conf_threshold, iou_threshold : traced scalars — changing them (the
        reference's two-pass benchmark_conf / yolo_conf protocol,
        e2e.py:971-992) reuses the compiled program; only the shape budgets
        are static.

    Returns padded ``(boxes (.., D, 4), scores (.., D), class_ids (.., D),
    valid (.., D) bool)`` with D = ``max_detections``, score-descending.
    """
    conf_threshold = jnp.asarray(conf_threshold, jnp.float32)
    iou_threshold = jnp.asarray(iou_threshold, jnp.float32)
    fn = functools.partial(
        _nms_single,
        conf_threshold=conf_threshold,
        iou_threshold=iou_threshold,
        max_candidates=max_candidates,
        max_detections=max_detections,
    )
    if boxes.ndim == 2:
        return fn(boxes, scores, class_ids)
    return jax.vmap(fn)(boxes, scores, class_ids)
