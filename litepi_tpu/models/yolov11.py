"""YOLOv11n baseline detector in Flax (NHWC).

The reference's third baseline (reference: README.md:41; exported graph
src/tt100k/convert/model/yolo11/yolo11_ncnn_model/model.ncnn.param, 277
layers).  v11 keeps v8's anchor-free DFL head family but swaps blocks:

* C3k2 — a C2f whose inner modules are either plain bottlenecks (c3k=False,
  the nano default for early stages) or C3k blocks (c3k=True, deep stages);
* C2PSA — partial self-attention after SPPF: the only attention in the
  repo's model zoo (400 spatial tokens at 640 input — trivially one chip);
* a depthwise-separable classification branch in the Detect head.

Nano scale: depth 0.5, width 0.25.  Raw outputs match YoloLitePi's contract
(``reg`` (B, A, 4*reg_max), ``cls`` (B, A, nc)) so decode/NMS/eval are shared.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from litepi_tpu.core.types import make_divisible, scale_depth
from litepi_tpu.models.layers import Bottleneck, ConvBN, SPPF, upsample2x_nearest


class _HalfBottleneck(nn.Module):
    """Ultralytics' default-expansion Bottleneck (e=0.5): 3x3 down to half
    width, 3x3 back up, residual.  C3k2's plain inner block — confirmed by
    the shipped v11n export (model.ncnn.param conv_6/conv_7: 16->8->16 3x3
    pairs); v8's C2f variant (layers.Bottleneck) uses e=1.0 instead."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = ConvBN(
            self.features // 2, 3, dtype=self.dtype, name="cv1"
        )(x, train)
        y = ConvBN(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3k(nn.Module):
    """C3 with 2 inner bottlenecks whose BOTH convs are 3x3 (v11's
    deep-stage inner block; v5's C3 uses 1x1+3x3 pairs — the shipped v11n
    export shows four (c,c,3) convs per C3k, conv_17-20)."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        hidden = self.features // 2
        a = ConvBN(hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(2):
            a = Bottleneck(hidden, self.shortcut, self.dtype, name=f"m{i}")(
                a, train
            )
        b = ConvBN(hidden, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv3")(y, train)


class C3k2(nn.Module):
    """v11's CSP block: C2f whose inner modules are C3k (deep stages) or
    half-expansion bottlenecks (nano's early stages).  ``e`` controls the
    hidden width (0.25 on the first two backbone stages)."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        hidden = int(self.features * self.e)
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for i in range(self.n):
            if self.c3k:
                b = C3k(hidden, self.shortcut, self.dtype, name=f"m{i}")(b, train)
            else:
                b = _HalfBottleneck(
                    hidden, self.shortcut, self.dtype, name=f"m{i}"
                )(b, train)
            outs.append(b)
        y = jnp.concatenate(outs, axis=-1)
        return ConvBN(self.features, 1, dtype=self.dtype, name="cv2")(y, train)


class SpatialAttention(nn.Module):
    """v11's PSA attention: MHSA over spatial tokens with a depthwise
    positional-encoding branch on V."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh_kd = key_dim * self.num_heads
        qkv = ConvBN(
            self.dim + 2 * nh_kd, 1, act=False, dtype=self.dtype, name="qkv"
        )(x, train)
        n = h * w
        q, k, v = jnp.split(
            qkv.reshape(b, n, -1), [nh_kd, 2 * nh_kd], axis=-1
        )
        q = q.reshape(b, n, self.num_heads, key_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, key_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            / jnp.sqrt(float(key_dim)),
            axis=-1,
        ).astype(v.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        pe = ConvBN(
            self.dim, 3, groups=self.dim, act=False, dtype=self.dtype, name="pe"
        )(v.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim), train)
        return ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            y + pe, train
        )


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = x + SpatialAttention(
            self.dim, self.num_heads, dtype=self.dtype, name="attn"
        )(x, train)
        y = ConvBN(self.dim * 2, 1, dtype=self.dtype, name="ffn1")(x, train)
        y = ConvBN(self.dim, 1, act=False, dtype=self.dtype, name="ffn2")(y, train)
        return x + y


class C2PSA(nn.Module):
    features: int
    n: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        hidden = self.features // 2
        y = ConvBN(2 * hidden, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(
                hidden, max(hidden // 64, 1), dtype=self.dtype, name=f"m{i}"
            )(b, train)
        return ConvBN(
            self.features, 1, dtype=self.dtype, name="cv2"
        )(jnp.concatenate([a, b], axis=-1), train)


class YoloV11(nn.Module):
    """YOLOv11 detector; default scales give v11n.  Output contract matches
    YoloLitePi (shared decode/NMS/eval/loss)."""

    num_classes: int = 1
    width: float = 0.25
    depth: float = 0.5
    reg_max: int = 16
    dtype: jnp.dtype = jnp.float32

    @property
    def channels(self) -> Tuple[int, ...]:
        return tuple(
            make_divisible(c * self.width) for c in (64, 128, 256, 512, 1024)
        )

    @nn.compact
    def __call__(self, x, train=False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        x = x.astype(dt)
        c = self.channels
        n = scale_depth(2, self.depth)  # v11 uses n=2 everywhere pre-scale

        x = ConvBN(c[0], 3, 2, dtype=dt, name="stem")(x, train)
        x = ConvBN(c[1], 3, 2, dtype=dt, name="down1")(x, train)
        x = C3k2(c[2], n, False, 0.25, dtype=dt, name="c3k2_1")(x, train)
        x = ConvBN(c[2], 3, 2, dtype=dt, name="down2")(x, train)
        p3 = C3k2(c[3], n, False, 0.25, dtype=dt, name="c3k2_2")(x, train)
        x = ConvBN(c[3], 3, 2, dtype=dt, name="down3")(p3, train)
        p4 = C3k2(c[3], n, True, dtype=dt, name="c3k2_3")(x, train)
        x = ConvBN(c[4], 3, 2, dtype=dt, name="down4")(p4, train)
        x = C3k2(c[4], n, True, dtype=dt, name="c3k2_4")(x, train)
        x = SPPF(c[4], 5, dtype=dt, name="sppf")(x, train)
        p5 = C2PSA(c[4], n, dtype=dt, name="c2psa")(x, train)

        t4 = jnp.concatenate([upsample2x_nearest(p5), p4], axis=-1)
        t4 = C3k2(c[3], n, False, dtype=dt, name="td_p4")(t4, train)
        t3 = jnp.concatenate([upsample2x_nearest(t4), p3], axis=-1)
        n3 = C3k2(c[2], n, False, dtype=dt, name="td_p3")(t3, train)
        b4 = ConvBN(c[2], 3, 2, dtype=dt, name="bu_down3")(n3, train)
        n4 = C3k2(c[3], n, False, dtype=dt, name="bu_p4")(
            jnp.concatenate([b4, t4], axis=-1), train
        )
        b5 = ConvBN(c[3], 3, 2, dtype=dt, name="bu_down4")(n4, train)
        n5 = C3k2(c[4], n, True, dtype=dt, name="bu_p5")(
            jnp.concatenate([b5, p5], axis=-1), train
        )

        # v8-style head; v11's cls branch is depthwise-separable
        c_reg = max(16, c[2] // 4, 4 * self.reg_max)
        c_cls = max(c[2], min(self.num_classes, 100))
        reg_out, cls_out = [], []
        for i, f in enumerate((n3, n4, n5)):
            r = ConvBN(c_reg, 3, dtype=dt, name=f"reg{i}_cv1")(f, train)
            r = ConvBN(c_reg, 3, dtype=dt, name=f"reg{i}_cv2")(r, train)
            r = nn.Conv(4 * self.reg_max, (1, 1), dtype=dt, name=f"reg{i}_out")(r)
            k = ConvBN(
                f.shape[-1], 3, groups=f.shape[-1], dtype=dt,
                name=f"cls{i}_dw1",
            )(f, train)
            k = ConvBN(c_cls, 1, dtype=dt, name=f"cls{i}_pw1")(k, train)
            k = ConvBN(
                c_cls, 3, groups=c_cls, dtype=dt, name=f"cls{i}_dw2"
            )(k, train)
            k = ConvBN(c_cls, 1, dtype=dt, name=f"cls{i}_pw2")(k, train)
            k = nn.Conv(self.num_classes, (1, 1), dtype=dt, name=f"cls{i}_out")(k)
            b = f.shape[0]
            reg_out.append(r.reshape(b, -1, 4 * self.reg_max))
            cls_out.append(k.reshape(b, -1, self.num_classes))
        return {
            "reg": jnp.concatenate(reg_out, 1).astype(jnp.float32),
            "cls": jnp.concatenate(cls_out, 1).astype(jnp.float32),
        }
