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


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def crop_and_resize(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int = 64,
    compute_dtype: jnp.dtype = jnp.float32,
    chunk: int = 1,
) -> jnp.ndarray:
    """Extract a fixed budget of ROIs per image, entirely on device.

    Parameters
    ----------
    images : (B, H, W, 3) float (original-resolution frames)
    boxes : (B, D, 4) xyxy in image pixel coordinates
    valid : (B, D) bool — invalid slots produce zero crops
    compute_dtype : matmul precision; bfloat16 halves the crop cost at
        imperceptible quality loss (pixel values are 8-bit to begin with)
    chunk : images processed per sequential step.  At the round-4 serving
        budget (D=8 slots/frame) the per-image ``lax.map`` loop overhead
        dominates the shrunken matmuls; vectorising ``chunk`` images per
        step measured 0.99 vs 1.45 ms at B=128/D=8 on-chip (round 5) while
        a large chunk re-inflates the (k, D, out, W, C) intermediate the
        sequential form exists to bound (chunk=32 measured 2.2 ms; the
        earlier D=16/64 measurements where chunking LOST are in PARITY).
        Values that do not divide B fall back to the largest divisor.

    Returns (B, D, out_size, out_size, 3) float32.
    """
    h, w = images.shape[1], images.shape[2]

    def crop_block(image, img_boxes, img_valid):
        """(k, H, W, 3), (k, D, 4), (k, D) -> (k, D, out, out, 3)."""
        x1 = jnp.floor(img_boxes[..., 0])
        y1 = jnp.floor(img_boxes[..., 1])
        bw = jnp.maximum(jnp.floor(img_boxes[..., 2]) - x1, 1.0)
        bh = jnp.maximum(jnp.floor(img_boxes[..., 3]) - y1, 1.0)
        wy = jax.vmap(lambda a, b: interp_weights(a, b, out_size, h))(y1, bh)
        wx = jax.vmap(lambda a, b: interp_weights(a, b, out_size, w))(x1, bw)
        img = image.astype(compute_dtype)
        # y-stage: one (D*out, H) x (H, W*C) matmul per image for all crops
        t = jnp.einsum(
            "kdoh,khwc->kdowc", wy.astype(compute_dtype), img,
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype)
        # x-stage: D-batched (out, W) contraction
        crops = jnp.einsum(
            "kdpw,kdowc->kdopc", wx.astype(compute_dtype), t,
            preferred_element_type=jnp.float32,
        )
        return jnp.where(img_valid[..., None, None, None], crops, 0.0)

    # sequential over image chunks bounds the (k, D, out, W, C) intermediate
    # to k images' worth; each step still issues MXU-saturating matmuls
    b = images.shape[0]
    k = max(
        (c for c in range(1, min(chunk, b) + 1) if b % c == 0), default=1
    )
    out = jax.lax.map(
        lambda a: crop_block(*a),
        (
            images.reshape(b // k, k, *images.shape[1:]),
            boxes.reshape(b // k, k, *boxes.shape[1:]),
            valid.reshape(b // k, k, *valid.shape[1:]),
        ),
    )
    return out.reshape(b, *out.shape[2:])


def _window_hat(
    start: jnp.ndarray,
    extent: jnp.ndarray,
    r0: jnp.ndarray,
    limit: jnp.ndarray,
    out_n: int,
    window: int,
) -> jnp.ndarray:
    """Hat weights over a ``window``-row slice starting at ``r0``.

    start/extent/r0/limit: (D,) per-crop scalars in the SAMPLED level's
    coordinates.  Returns (D, out_n, window); row o of crop d reproduces
    exactly the dense :func:`interp_weights` row restricted to
    [r0, r0+window) — taps outside never carry weight for in-window crops.
    """
    u = (
        (jnp.arange(out_n, dtype=jnp.float32) + 0.5)[None, :]
        * (extent / out_n)[:, None]
        - 0.5
        + start[:, None]
    )
    u = jnp.clip(u, 0.0, limit[:, None] - 1.0)
    grid = r0[:, None, None] + jnp.arange(window, dtype=jnp.float32)[None, None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - grid))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def crop_and_resize_windowed(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int = 64,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    window: int = 128,
) -> jnp.ndarray:
    """Windowed ROI crop: identical sampling to :func:`crop_and_resize` at a
    fraction of the FLOPs, for detection workloads where crops are small.

    The dense form multiplies every crop against ALL H (and W) source lines —
    O(D*out*H*W*C) — although a 64x64 bilinear crop of a box smaller than
    ``window`` touches at most ``window`` consecutive rows/cols.  Here each
    crop extracts one (window, window, C) ``dynamic_slice`` and interpolates
    inside it: O(D*(out*window^2 + out^2*window)*C), ~20x fewer FLOPs at
    H=W=640, window=128 — and bit-identical weights/taps for any box with
    extent <= window-3.

    Boxes LARGER than the window sample a 4^k average-pooled pyramid level
    (k chosen per crop so the scaled extent fits).  That is anti-aliased
    area-then-bilinear sampling — not the reference's raw 2-tap bilinear,
    which for heavy downscales aliases badly; quality is equal or better,
    and detection crops this large are rare (a >128 px traffic sign).  Exact
    reference parity when it matters (the eval CLI) uses host crops; the
    dense device path remains available via ``PipelineConfig.roi_window=0``.

    MEASURED DEAD END on the current stack (TPU v5e, round 2): despite the
    ~20x FLOP reduction this runs ~6x SLOWER than the dense crop (64 ms vs
    11 ms for B=128, D=64, 640x640) — the vmapped ``dynamic_slice`` lowers
    to per-crop HBM gathers, the same memory-latency wall as the original
    gather resampler (module docstring).  Kept as an opt-in
    (``PipelineConfig.roi_window>0``) because the windowing algebra is
    correct and golden-tested; a Pallas kernel with explicit VMEM window
    staging is the remaining route to beating the dense matmuls.

    images: (B, H, W, 3) any real dtype (uint8 passes straight through).
    Returns (B, D, out_size, out_size, 3) float32, zeroed at invalid slots.
    """
    h, w = int(images.shape[1]), int(images.shape[2])
    # window<=0 (the "dense" config sentinel) or tiny frames: the dense
    # path is already cheap and exact
    if window <= 0 or min(h, w) <= window:
        return crop_and_resize(images, boxes, valid, out_size, compute_dtype)

    # pyramid levels 4^k until a level fits inside the window
    scales = [1]
    while max(h, w) // scales[-1] > window:
        scales.append(scales[-1] * 4)
    sizes = [(max(h // s, 1), max(w // s, 1)) for s in scales]

    x = images.astype(compute_dtype)
    pyramid = [x]
    for k in range(1, len(scales)):
        hk, wk = sizes[k]
        p = jax.lax.reduce_window(
            pyramid[k - 1].astype(jnp.float32),
            0.0,
            jax.lax.add,
            (1, 4, 4, 1),
            (1, 4, 4, 1),
            "VALID",
        ) * 0.0625
        pyramid.append(p.astype(compute_dtype))
    # pad every level to at least (window, window) so one static slice shape
    # serves all branches (zero rows/cols never receive hat weight: sample
    # coords are clamped to the level's true limit)
    for k in range(len(pyramid)):
        hk, wk = sizes[k]
        ph, pw = max(window - hk, 0), max(window - wk, 0)
        if ph or pw:
            pyramid[k] = jnp.pad(pyramid[k], ((0, 0), (0, ph), (0, pw), (0, 0)))

    n_levels = len(scales)
    scales_f = jnp.asarray(scales, jnp.float32)
    lim_h = jnp.asarray([s[0] for s in sizes], jnp.float32)
    lim_w = jnp.asarray([s[1] for s in sizes], jnp.float32)

    def per_image(args):
        levels = args[:n_levels]
        img_boxes, img_valid = args[n_levels], args[n_levels + 1]
        x1 = jnp.floor(img_boxes[:, 0])
        y1 = jnp.floor(img_boxes[:, 1])
        bw = jnp.maximum(jnp.floor(img_boxes[:, 2]) - x1, 1.0)
        bh = jnp.maximum(jnp.floor(img_boxes[:, 3]) - y1, 1.0)
        ext = jnp.maximum(bw, bh)
        # smallest level whose scaled extent fits the window.  Sample taps
        # span [floor(start)-1, start+extent+0.5] (the first half-pixel
        # centre sits left of ``start`` whenever the crop upscales), so the
        # window starts one row early and exactness needs extent<=window-3.
        lv = jnp.sum(
            ext[:, None] > (window - 3) * scales_f[None, :-1], axis=1
        ).astype(jnp.int32) if n_levels > 1 else jnp.zeros_like(x1, jnp.int32)
        s = scales_f[lv]
        y1s, bhs, x1s, bws = y1 / s, bh / s, x1 / s, bw / s
        lh, lw = lim_h[lv], lim_w[lv]
        r0 = jnp.clip(jnp.floor(y1s) - 1.0, 0.0, jnp.maximum(lh - window, 0.0))
        c0 = jnp.clip(jnp.floor(x1s) - 1.0, 0.0, jnp.maximum(lw - window, 0.0))
        wy = _window_hat(y1s, bhs, r0, lh, out_size, window).astype(compute_dtype)
        wx = _window_hat(x1s, bws, c0, lw, out_size, window).astype(compute_dtype)

        def slice_level(k, r, c):
            return jax.lax.dynamic_slice(
                levels[k],
                (r, c, 0),
                (window, window, levels[k].shape[-1]),
            )

        def one_window(lv_d, r_d, c_d):
            return jax.lax.switch(
                lv_d,
                [functools.partial(slice_level, k) for k in range(n_levels)],
                r_d,
                c_d,
            )

        win = jax.vmap(one_window)(
            lv, r0.astype(jnp.int32), c0.astype(jnp.int32)
        )  # (D, window, window, C)
        t = jnp.einsum(
            "dow,dwxc->doxc", wy, win, preferred_element_type=jnp.float32
        ).astype(compute_dtype)
        crops = jnp.einsum(
            "dpx,doxc->dopc", wx, t, preferred_element_type=jnp.float32
        )
        return jnp.where(img_valid[:, None, None, None], crops, 0.0)

    return jax.lax.map(per_image, tuple(pyramid) + (boxes, valid))
