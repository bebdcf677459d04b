"""Distribution Focal Loss (DFL) box decode.

The exported reference graph decodes boxes in-graph: reshape the 64-channel
regression output to (16 bins, 4 sides), softmax over bins, then a 1x1 conv
whose fixed weights are [0..15] — i.e. the expectation of the bin distribution
— followed by anchor-point add and stride multiply (reference:
model.ncnn.param:184-195).  Here that whole chain is a few fused vector ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dfl_decode(reg_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Softmax-expectation decode of per-side distance distributions.

    reg_logits: (..., A, 4 * reg_max) raw head output, bin-major per side in
    the Ultralytics layout (reshape to (4, reg_max) per anchor).
    Returns (..., A, 4) distances (l, t, r, b) in feature-map units.
    """
    shape = reg_logits.shape[:-1] + (4, reg_max)
    # softmax + expectation in float32 regardless of input dtype; the output
    # (..., 4) is tiny, so only the fused reduction pays f32 bandwidth
    logits = reg_logits.reshape(shape).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def decode_boxes(
    distances: jnp.ndarray,
    anchor_points: jnp.ndarray,
    strides: jnp.ndarray,
    xywh: bool = True,
) -> jnp.ndarray:
    """Turn (l, t, r, b) distances into boxes in input-pixel space.

    distances: (..., A, 4); anchor_points: (A, 2); strides: (A, 1).
    The reference's exported graph emits xywh (then its numpy postprocess
    converts to xyxy — e2e.py:266-270); both layouts are offered so the fused
    pipeline can skip the round-trip.
    """
    lt, rb = distances[..., :2], distances[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c = (x1y1 + x2y2) * 0.5
        wh = x2y2 - x1y1
        return jnp.concatenate([c, wh], axis=-1) * strides
    return jnp.concatenate([x1y1, x2y2], axis=-1) * strides


def decode_candidates(
    head_out,
    anchor_points: jnp.ndarray,
    strides: jnp.ndarray,
    reg_max: int = 16,
    k: int = 512,
    selector: str = "exact",
):
    """Top-``k`` score-descending candidates from a ``{reg, cls}`` head
    output (the YoloLitePi/YoloV11 contract).

    Scores are reduced and top-k'd over the full anchor set *before* any box
    math, so the only full-size (A,) tensors are the head logits — an (A, 4)
    box tensor with a minor dim of 4 wastes 97% of each TPU vector register
    (measured 3x the backbone's runtime in round 1).  DFL decode runs on all
    anchors (it fuses into the head-output reduction) but only 4-wide
    distance rows are gathered.

    Measured dead-end (round 5, do not retry): gathering the 64-wide reg
    rows for the K candidates first and running DFL on (B, K, 64) only wins
    the STANDALONE microbench (1.75 vs 2.06 ms at B=128/A=8400/K=64) but
    LOSES 0.5 ms in the full fused program (15.12 vs 14.62 ms back-to-back
    on-chip): in-program XLA fuses the all-anchor softmax-expectation into
    the head's output epilogue, while gather-first inserts an unfusable
    64-wide gather between the head matmuls and the decode.  The stage
    split's 0.85 ms "decode" row is the fused epilogue cost, not removable
    by decode reordering.

    ``selector="approx"`` swaps the exact sort-based ``top_k`` for the
    TPU-native partial-reduce ``approx_max_k`` (recall_target 0.95): a
    serving knob measured 0.12 vs 0.31 ms at B=128/A=8400/K=64 on-chip.
    The per-op recall guarantee applies to the WHOLE k-set; on realistic
    peaked score maps the candidates that actually clear a conf threshold
    are retained at ~0.996 (what approx loses is the all-tied background
    tail, which NMS's conf gate drops anyway).  Not bit-identical to the
    exact path — parity/eval configs keep "exact" (the default).

    Returns (boxes (B, K, 4) xyxy input-pixel space, scores (B, K),
    class_ids (B, K)).
    """
    probs = jax.nn.sigmoid(head_out["cls"].astype(jnp.float32))
    scores = probs.max(axis=-1)
    class_ids = probs.argmax(axis=-1).astype(jnp.int32)
    k = min(k, scores.shape[-1])
    if selector == "approx":
        raw_scores, idx = jax.lax.approx_max_k(
            scores, k, recall_target=0.95
        )
        # approx_max_k's aggregated output is score-descending like top_k's
        top_scores = raw_scores
    elif selector == "exact":
        top_scores, idx = jax.lax.top_k(scores, k)
    else:
        raise ValueError(f"unknown candidate selector {selector!r}")
    dist = dfl_decode(head_out["reg"], reg_max)
    dist_top = jnp.take_along_axis(dist, idx[..., None], axis=1)
    boxes = decode_boxes(
        dist_top, anchor_points[idx], strides[idx], xywh=False
    )
    cls_top = jnp.take_along_axis(class_ids, idx, axis=1)
    return boxes, top_scores, cls_top
