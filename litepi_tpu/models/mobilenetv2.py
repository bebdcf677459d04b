"""MobileNetV2 in Flax (NHWC), mirroring torchvision's ``mobilenet_v2``
(reference usage: build_classifier e2e.py:320-347; README.md:64 row)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision's channel rounding (round-to-nearest, never below 90%)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    fused: bool = False  # deploy form: biased conv, BN pre-folded

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        if self.fused and train:
            raise ValueError("fused ConvBN has no batch stats to train")
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=self.fused,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        return jnp.clip(x, 0.0, 6.0) if self.act else x


class InvertedResidualV2(nn.Module):
    features: int
    stride: int
    expand: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        fu = self.fused
        y = x
        if self.expand != 1:
            y = _ConvBNReLU6(hidden, 1, dtype=self.dtype, fused=fu, name="pw")(y, train)
        y = _ConvBNReLU6(
            hidden, 3, self.stride, groups=hidden, dtype=self.dtype,
            fused=fu, name="dw"
        )(y, train)
        y = _ConvBNReLU6(
            self.features, 1, act=False, dtype=self.dtype, fused=fu,
            name="pw_linear"
        )(y, train)
        if self.stride == 1 and c_in == self.features:
            y = x + y
        return y


# (expand t, channels c, repeats n, stride s) — the MobileNetV2 paper table
_V2_SETTINGS: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    num_classes: int
    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt, fu = self.dtype, self.fused
        x = x.astype(dt)
        c = _make_divisible(32 * self.width_mult)
        x = _ConvBNReLU6(c, 3, 2, dtype=dt, fused=fu, name="stem")(x, train)
        idx = 0
        for t, ch, n, s in _V2_SETTINGS:
            out_c = _make_divisible(ch * self.width_mult)
            for i in range(n):
                x = InvertedResidualV2(
                    out_c, s if i == 0 else 1, t, dtype=dt, fused=fu,
                    name=f"block{idx}"
                )(x, train)
                idx += 1
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        x = _ConvBNReLU6(last, 1, dtype=dt, fused=fu, name="head_conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
