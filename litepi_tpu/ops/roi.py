"""In-graph ROI crop + resize: the bridge between detector and classifier.

The reference extracts ROIs on the host: integer-truncated box coords slice
the original numpy image, each crop is resized to 64x64 and normalised, then
stacked into classifier batches (reference: e2e.py:459-485 crop loop,
:377-396 ``predict_batch``).  That host round-trip is exactly what caps the
Pi pipeline's throughput.

Here the crop+resize runs inside the same XLA program as the detector and
classifier, over a fixed ``max_detections`` budget with a validity mask.
Geometry matches the reference: the sampled region is
``[int(x1):int(x2), int(y1):int(y2)]`` (integer truncation), sampled at
half-pixel centres (bilinear, no antialiasing).

Implementation note (TPU): bilinear resampling as a *gather* is
memory-latency-bound and maps terribly onto the TPU (measured 84 ms for
64 frames x 64 ROIs).  Bilinear interpolation is a linear map per axis, so
each crop is two small matmuls instead:

    crop = Wy @ image @ Wx^T,   Wy: (out, H), Wx: (out, W)

where each W row is the 2-tap hat kernel around the sample coordinate.  The
y-stage batches all D crops of an image into one (D*out, H) x (H, W*C)
matmul and the x-stage is a D-batched (out, W) x (W, out*C) contraction —
both ride the MXU.  ~20x faster than the gather form, numerically identical
(the hat weights reproduce exactly the 2-tap lerp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def interp_weights(
    start: jnp.ndarray, extent: jnp.ndarray, out_n: int, limit: int
) -> jnp.ndarray:
    """Hat-kernel interpolation matrices for one axis, all crops at once.

    start, extent: (D,) floats.  Returns (D, out_n, limit) weights where
    ``W[d, o] @ signal`` equals half-pixel-centre bilinear sampling of sample
    o of crop d (coordinates clamped at the borders, cv2-style replicate).
    """
    u = (
        (jnp.arange(out_n, dtype=jnp.float32) + 0.5)[None, :]
        * (extent / out_n)[:, None]
        - 0.5
        + start[:, None]
    )  # (D, out_n)
    u = jnp.clip(u, 0.0, float(limit - 1))
    grid = jnp.arange(limit, dtype=jnp.float32)[None, None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - grid))


@functools.partial(jax.jit, static_argnums=(3, 4))
def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int = 64,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Extract a fixed budget of ROIs per image, entirely on device.

    Parameters
    ----------
    images : (B, H, W, 3) float (original-resolution frames)
    boxes : (B, D, 4) xyxy in image pixel coordinates
    valid : (B, D) bool — invalid slots produce zero crops
    compute_dtype : matmul precision; bfloat16 halves the crop cost at
        imperceptible quality loss (pixel values are 8-bit to begin with)

    Returns (B, D, out_size, out_size, 3) float32.
    """
    h, w = images.shape[1], images.shape[2]

    def per_image(args):
        image, img_boxes, img_valid = args
        x1 = jnp.floor(img_boxes[:, 0])
        y1 = jnp.floor(img_boxes[:, 1])
        bw = jnp.maximum(jnp.floor(img_boxes[:, 2]) - x1, 1.0)
        bh = jnp.maximum(jnp.floor(img_boxes[:, 3]) - y1, 1.0)
        wy = interp_weights(y1, bh, out_size, h).astype(compute_dtype)
        wx = interp_weights(x1, bw, out_size, w).astype(compute_dtype)
        img = image.astype(compute_dtype)
        # y-stage: one (D*out, H) x (H, W*C) matmul for all crops
        t = jnp.einsum(
            "doh,hwc->dowc", wy, img, preferred_element_type=jnp.float32
        ).astype(compute_dtype)
        # x-stage: D-batched (out, W) contraction
        crops = jnp.einsum(
            "dpw,dowc->dopc", wx, t, preferred_element_type=jnp.float32
        )
        return jnp.where(img_valid[:, None, None, None], crops, 0.0)

    # sequential over images bounds the (D, out, W, C) intermediate to one
    # image's worth; each image still issues MXU-saturating matmuls
    return jax.lax.map(per_image, (images, boxes, valid))
