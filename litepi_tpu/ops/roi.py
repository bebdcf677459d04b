"""In-graph ROI crop + resize: the bridge between detector and classifier.

The reference extracts ROIs on the host: integer-truncated box coords slice
the original numpy image, each crop is resized to 64x64 and normalised, then
stacked into classifier batches (reference: e2e.py:459-485 crop loop,
:377-396 ``predict_batch``).  That host round-trip is exactly what caps the
Pi pipeline's throughput.

Here the crop+resize is a batched bilinear *gather* that runs inside the same
XLA program as the detector and classifier, over a fixed ``max_detections``
budget with a validity mask.  Geometry matches the reference: the sampled
region is ``[int(x1):int(x2), int(y1):int(y2)]`` (integer truncation), sampled
at half-pixel centres (bilinear, no antialiasing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_axis(start: jnp.ndarray, extent: jnp.ndarray, out_n: int, limit: int):
    """Half-pixel sample coordinates for one axis of one ROI."""
    u = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * (extent / out_n) - 0.5 + start
    u = jnp.clip(u, 0.0, float(limit - 1))
    lo = jnp.floor(u).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, limit - 1)
    frac = u - lo.astype(jnp.float32)
    return lo, hi, frac


def _crop_one(image: jnp.ndarray, box: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear crop+resize of one xyxy box from an HWC float image."""
    h, w = image.shape[0], image.shape[1]
    x1 = jnp.floor(box[0])
    y1 = jnp.floor(box[1])
    x2 = jnp.floor(box[2])
    y2 = jnp.floor(box[3])
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    y_lo, y_hi, fy = _sample_axis(y1, bh, out_size, h)
    x_lo, x_hi, fx = _sample_axis(x1, bw, out_size, w)

    top = (
        image[y_lo][:, x_lo] * (1 - fx)[None, :, None]
        + image[y_lo][:, x_hi] * fx[None, :, None]
    )
    bot = (
        image[y_hi][:, x_lo] * (1 - fx)[None, :, None]
        + image[y_hi][:, x_hi] * fx[None, :, None]
    )
    return top * (1 - fy)[:, None, None] + bot * fy[:, None, None]


@functools.partial(jax.jit, static_argnums=(3,))
def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int = 64,
) -> jnp.ndarray:
    """Extract a fixed budget of ROIs per image, entirely on device.

    Parameters
    ----------
    images : (B, H, W, 3) float32 (original-resolution frames)
    boxes : (B, D, 4) xyxy in image pixel coordinates
    valid : (B, D) bool — invalid slots produce zero crops

    Returns (B, D, out_size, out_size, 3) float32.
    """
    images = images.astype(jnp.float32)

    def per_image(image, img_boxes, img_valid):
        crops = jax.vmap(lambda b: _crop_one(image, b, out_size))(img_boxes)
        return jnp.where(img_valid[:, None, None, None], crops, 0.0)

    return jax.vmap(per_image)(images, boxes, valid)
