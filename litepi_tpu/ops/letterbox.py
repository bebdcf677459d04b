"""Letterbox resize: aspect-preserving resize + grey padding to a square.

The reference letterboxes on the host with cv2 (reference: e2e.py:66-86):
``r = min(new/h, new/w)``, resize with INTER_LINEAR, then pad to 640x640 with
value 114, splitting the padding as ``round(d - 0.1)`` top/left and
``round(d + 0.1)`` bottom/right.

We provide three implementations:

* :func:`letterbox_host` — exact cv2 behaviour, used when parity with the
  reference CSV numbers matters (cv2's INTER_LINEAR has no antialiasing).
* :func:`letterbox_device` — pure-JAX, runs inside the jitted program.  Uses
  half-pixel-center bilinear sampling without antialiasing, which matches
  cv2.INTER_LINEAR semantics to float rounding.  Shapes must be static, so the
  source resolution is a compile-time constant (one compiled program per
  camera resolution — the serving-path assumption).
* :func:`letterbox_params` — the (ratio, dw, dh) mapping both share, needed to
  un-map boxes back to original pixel coordinates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_VALUE = 114


def letterbox_params(
    h: int, w: int, new_shape: int = 640
) -> Tuple[float, float, float, Tuple[int, int], Tuple[int, int, int, int]]:
    """Compute the reference's letterbox geometry.

    Returns ``(ratio, dw, dh, (new_w, new_h), (top, bottom, left, right))``
    where dw/dh are the half-padding *before* the asymmetric rounding split
    (reference: e2e.py:74-83).
    """
    r = min(new_shape / h, new_shape / w)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw = (new_shape - new_w) / 2
    dh = (new_shape - new_h) / 2
    top = int(round(dh - 0.1))
    bottom = int(round(dh + 0.1))
    left = int(round(dw - 0.1))
    right = int(round(dw + 0.1))
    return r, dw, dh, (new_w, new_h), (top, bottom, left, right)


def letterbox_host(
    image: np.ndarray, new_shape: int = 640
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """cv2-exact letterbox on the host. ``image`` is HWC uint8 (any colour
    order — this op is colour-agnostic).  Returns (canvas, ratio, (dw, dh))."""
    import cv2

    h, w = image.shape[:2]
    r, dw, dh, (new_w, new_h), (top, bottom, left, right) = letterbox_params(
        h, w, new_shape
    )
    if (new_w, new_h) != (w, h):
        image = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    image = cv2.copyMakeBorder(
        image, top, bottom, left, right, cv2.BORDER_CONSTANT,
        value=(PAD_VALUE, PAD_VALUE, PAD_VALUE),
    )
    return image, r, (dw, dh)


def _bilinear_resize_no_aa(
    imgs: jnp.ndarray, out_h: int, out_w: int, compute_dtype: jnp.dtype
) -> jnp.ndarray:
    """Half-pixel-center bilinear resize without antialiasing (cv2.INTER_LINEAR
    semantics) for a batch of HWC images.

    Implemented as two interpolation-matrix contractions that ride the TPU
    MXU (see ops/roi.py for the derivation) — a gather formulation is
    memory-latency-bound and an order of magnitude slower on TPU.  The weight
    matrices are compile-time constants (static shapes), shared by the batch.
    """
    from litepi_tpu.ops.roi import interp_weights

    in_h, in_w = imgs.shape[1], imgs.shape[2]
    zero = jnp.zeros((1,), jnp.float32)
    wy = interp_weights(zero, jnp.full((1,), float(in_h)), out_h, in_h)[0]
    wx = interp_weights(zero, jnp.full((1,), float(in_w)), out_w, in_w)[0]
    wy = wy.astype(compute_dtype)
    wx = wx.astype(compute_dtype)
    x = imgs.astype(compute_dtype)
    t = jnp.einsum("oh,bhwc->bowc", wy, x, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "pw,bowc->bopc", wx, t.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out


@functools.partial(jax.jit, static_argnums=(1, 2))
def letterbox_device(
    images: jnp.ndarray,
    new_shape: int = 640,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """In-graph letterbox for a batch of same-resolution frames.

    ``images``: (B, H, W, 3) uint8.  Returns (B, new, new, 3) in
    ``compute_dtype``, values in [0, 255] (normalisation happens in the
    model's preprocessing so the two stay fused).  Geometry matches
    :func:`letterbox_params` exactly; resize is non-antialiased bilinear,
    matching cv2.INTER_LINEAR.  ``compute_dtype`` bfloat16 halves the resize
    cost AND the canvas bandwidth (pixels are 8-bit; worst-case bf16
    rounding is below quantisation noise); the identity-resolution path
    skips resampling — and the canvas copy — entirely.
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    r, dw, dh, (new_w, new_h), (top, bottom, left, right) = letterbox_params(
        h, w, new_shape
    )
    if (w, h) == (new_shape, new_shape):
        # input already at target size: no resample, no pad band — the cast
        # is the whole op
        return images.astype(compute_dtype)
    if (new_w, new_h) == (w, h):
        resized = images.astype(compute_dtype)
    else:
        resized = _bilinear_resize_no_aa(images, new_h, new_w, compute_dtype)
    canvas = jnp.full(
        (b, new_shape, new_shape, 3), float(PAD_VALUE), dtype=compute_dtype
    )
    canvas = jax.lax.dynamic_update_slice(
        canvas, resized.astype(compute_dtype), (0, top, left, 0)
    )
    return canvas
