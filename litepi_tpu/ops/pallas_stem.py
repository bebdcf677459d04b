"""Pallas TPU kernel: fused uint8 frames -> stem conv + SiLU.

STATUS (round 3): RETAINED EXPERIMENT — numerically correct (interpreter-
mode golden tests, tests/test_pallas_stem.py) but NOT lowerable by Mosaic
on real TPU, so the serving pipeline does not use it.

Why it was built (PARITY perf notes, round 2b): the 3x3/s2 stem conv costs
2.7 ms of the 10.8 ms detector forward at B=128 while its HBM traffic floor
is ~0.9 ms — the conv is bandwidth/layout-bound, not MXU-bound (3 input
channels fill 3/128 lanes).  Worse, XLA's convolution is a fusion BARRIER:
the uint8 frames must first materialise as a bfloat16 canvas (a separate
cast pass) because elementwise producers cannot fuse into the conv
custom-call.  The kernel reads raw uint8 rows, builds stride-2 im2col
patches in-register, and runs one (40*W/2, 27)x(27, C_out) matmul per
row chunk with bias + SiLU fused.

Why it cannot lower (the measured dead end):

* patch construction from interleaved NHWC rows needs minor-dim (lane)
  regrouping — ``(W*3,) -> (W/2, 6)`` — which Mosaic rejects as an
  "unsupported shape cast" (so do stride-2/stride-6 lane selections, and
  ``dynamic_slice`` has no TC lowering at all; static ``a[i:j]`` slices
  and SUBLANE-side reshapes are fine);
* every reformulation that keeps lane dims intact (even/odd width phase
  split, channel-planar or width-on-sublane transposes) needs 2-3
  host-side XLA relayout passes over the frames plus a VPU-side 27-tap
  accumulation — together they cost as much HBM traffic/compute as the
  ~1 ms the kernel would save, so the XLA letterbox+stem stays.

The 1/255 input normalisation and the deploy-form BN fold are algebraic
weight transforms applied by the CALLER (scale the conv weights by 1/255;
fold_bn handles BN) so the kernel consumes 0..255 uint8 directly.
``YoloLitePi.apply(..., from_stem=True)`` remains as the integration hook
should a future Mosaic release lift the lane-split restriction.

Reference anchor: the stem is layer conv_2/silu_69 of the exported graph
(model.ncnn.param:4-5, 16ch 3x3 s2 at 640 -> 320).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# output rows computed per inner chunk: 40 output rows need 81 input rows;
# 8 chunks cover a 640-input / 320-output frame
_CHUNK_OUT_ROWS = 40


def _make_kernel(h: int, w: int, c_out: int, use_mxu: bool):
    oh, ow = h // 2, w // 2
    n_chunks = oh // _CHUNK_OUT_ROWS

    def kernel(img_ref, w_ref, b_ref, out_ref):
        # (h, w*3) uint8 -> float32 once; pad 1 pixel (=3 lanes) each side.
        # Mosaic has no direct u8->f32 cast; zero-extend through int32.
        x = img_ref[0].astype(jnp.int32).astype(jnp.float32)
        xp = jnp.pad(x, ((1, 1), (3, 3)))  # (h+2, w*3+6)
        wk = w_ref[...].astype(jnp.float32)  # (32, c_out): 27 taps + 5 pad
        bias = b_ref[...].astype(jnp.float32)  # (1, c_out)

        for chunk in range(n_chunks):
            # local rows 2r+dy for out rows r in [0, 40); 82 padded rows.
            # All slice bounds are static python ints -> the `slice`
            # primitive (Mosaic has no dynamic_slice lowering).
            r0 = chunk * 2 * _CHUNK_OUT_ROWS
            rows = xp[r0 : r0 + 2 * _CHUNK_OUT_ROWS + 2]
            taps = []
            for dy in range(3):
                # rows 2r+dy via sublane-pair split
                sub = rows[dy : dy + 2 * _CHUNK_OUT_ROWS].reshape(
                    _CHUNK_OUT_ROWS, 2, w * 3 + 6
                )[:, 0]
                for dx in range(3):
                    # lanes (2x+dx)*3 + c  ==  6x + 3*dx + c (pre-pad space)
                    shifted = sub[:, 3 * dx : 3 * dx + w * 3]
                    patch = shifted.reshape(_CHUNK_OUT_ROWS, ow, 6)[..., 0:3]
                    taps.append(patch)
            if use_mxu:
                # im2col: (40*ow, 27->32 lanes) @ (32, c_out) on the MXU
                p = jnp.concatenate(
                    taps + [jnp.zeros_like(taps[0][..., 0:1])] * 5, axis=-1
                ).reshape(_CHUNK_OUT_ROWS * ow, 32)
                y = jnp.dot(p, wk, preferred_element_type=jnp.float32)
                y = y.reshape(_CHUNK_OUT_ROWS, ow, c_out)
            else:
                # 9 thin dots (K=3) on the VPU
                y = jnp.zeros((_CHUNK_OUT_ROWS, ow, c_out), jnp.float32)
                for i, patch in enumerate(taps):
                    y = y + jax.lax.dot_general(
                        patch, wk[3 * i : 3 * i + 3],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            y = y + bias[0]
            y = y * jax.nn.sigmoid(y)  # SiLU, matching ConvBN's activation
            out_ref[0, chunk * _CHUNK_OUT_ROWS : (chunk + 1) * _CHUNK_OUT_ROWS] = (
                y.reshape(_CHUNK_OUT_ROWS, ow * c_out).astype(out_ref.dtype)
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "use_mxu", "out_dtype")
)
def pallas_stem(
    frames: jnp.ndarray,
    kernel_oihw_folded: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
    use_mxu: bool = True,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Fused stem over uint8 frames.

    frames: (B, H, W, 3) uint8, H and W divisible by 80.
    kernel_oihw_folded: (3, 3, 3, C_out) — the deploy-form (BN-folded) stem
        kernel in Flax HWIO layout, ALREADY scaled by 1/255.
    bias: (C_out,) folded bias.
    Returns (B, H/2, W/2, C_out) in ``out_dtype``.
    """
    b, h, w, _ = frames.shape
    if h % (2 * _CHUNK_OUT_ROWS) or w % 2:
        raise ValueError(f"frame size {h}x{w} not supported by pallas_stem")
    c_out = kernel_oihw_folded.shape[-1]
    # tap order must match the kernel's (dy, dx, c) patch construction;
    # HWIO reshape is exactly that order.  Pad K 27 -> 32 (sublane multiple)
    wk = jnp.concatenate(
        [
            kernel_oihw_folded.reshape(27, c_out).astype(jnp.float32),
            jnp.zeros((5, c_out), jnp.float32),
        ],
        axis=0,
    )
    flat = frames.reshape(b, h, w * 3)
    out = pl.pallas_call(
        _make_kernel(h, w, c_out, use_mxu),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, (w // 2) * c_out), out_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((32, c_out), lambda i: (0, 0)),
            pl.BlockSpec((1, c_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, h // 2, (w // 2) * c_out), lambda i: (i, 0, 0)
        ),
        interpret=interpret,
    )(flat, wk, bias.astype(jnp.float32)[None, :])
    return out.reshape(b, h // 2, w // 2, c_out)
