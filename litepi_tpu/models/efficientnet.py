"""EfficientNet-B0 in Flax (NHWC), mirroring torchvision's ``efficientnet_b0``
(reference usage: build_classifier e2e.py:320-347 and the camera apps
full_appv2.py:41-68 / full_appv3.py, which classify with EfficientNet)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class _ConvBNSiLU(nn.Module):
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
        return nn.silu(x) if self.act else x


class SqueezeExcite(nn.Module):
    squeeze_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_features, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    features: int
    kernel: int
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
            y = _ConvBNSiLU(hidden, 1, dtype=self.dtype, fused=fu, name="pw")(y, train)
        y = _ConvBNSiLU(
            hidden, self.kernel, self.stride, groups=hidden,
            dtype=self.dtype, fused=fu, name="dw",
        )(y, train)
        # SE squeeze width derives from the block *input* channels (÷4)
        y = SqueezeExcite(max(1, c_in // 4), dtype=self.dtype, name="se")(y)
        y = _ConvBNSiLU(
            self.features, 1, act=False, dtype=self.dtype, fused=fu,
            name="pw_linear"
        )(y, train)
        if self.stride == 1 and c_in == self.features:
            # stochastic depth is identity at inference; training uses dropout
            y = x + y
        return y


# (expand, channels, repeats, stride, kernel) — EfficientNet-B0 stage table
_B0_SETTINGS: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class EfficientNetB0(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt, fu = self.dtype, self.fused
        x = x.astype(dt)
        x = _ConvBNSiLU(32, 3, 2, dtype=dt, fused=fu, name="stem")(x, train)
        idx = 0
        for t, c, n, s, k in _B0_SETTINGS:
            for i in range(n):
                x = MBConv(
                    c, k, s if i == 0 else 1, t, dtype=dt, fused=fu,
                    name=f"block{idx}"
                )(x, train)
                idx += 1
        x = _ConvBNSiLU(1280, 1, dtype=dt, fused=fu, name="head_conv")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
