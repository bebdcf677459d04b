"""ShuffleNetV2 in Flax (NHWC) — the reference's chosen second-stage model.

The reference classifies 64x64 sign crops with torchvision's
``shufflenet_v2_x1_0`` (99.51% acc / 279 FPS on Pi CPU — reference:
README.md:66; built via ``build_classifier`` e2e.py:320-347).  This is a
ground-up Flax implementation that mirrors torchvision's architecture
*exactly* (stage layout, branch structure, BN eps 1e-5) so that `.pth`
state dicts convert losslessly via :mod:`litepi_tpu.weights.torch_import`.

The signature op — channel shuffle — is a pure reshape/transpose, which XLA
lowers to a layout change fused into the surrounding convs: free on TPU.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """NHWC channel shuffle: out[..., j] = in[..., (j % g) * (c // g) + j // g]
    — identical index permutation to the NCHW view/transpose in torchvision."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    relu: bool = True
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
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return nn.relu(x) if self.relu else x


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit.  stride 1: split halves, transform one, concat,
    shuffle.  stride 2: two parallel downsampling branches on the full input."""

    features: int  # output channels (even)
    stride: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.features // 2
        dt, fu = self.dtype, self.fused

        def branch2(inp: jnp.ndarray) -> jnp.ndarray:
            y = _ConvBNReLU(half, 1, dtype=dt, fused=fu, name="b2_pw1")(inp, train)
            y = _ConvBNReLU(
                half, 3, self.stride, groups=half, relu=False, dtype=dt,
                fused=fu, name="b2_dw",
            )(y, train)
            return _ConvBNReLU(half, 1, dtype=dt, fused=fu, name="b2_pw2")(y, train)

        if self.stride == 1:
            a, b = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate([a, branch2(b)], axis=-1)
        else:
            c_in = x.shape[-1]
            b1 = _ConvBNReLU(
                c_in, 3, self.stride, groups=c_in, relu=False, dtype=dt,
                fused=fu, name="b1_dw",
            )(x, train)
            b1 = _ConvBNReLU(half, 1, dtype=dt, fused=fu, name="b1_pw")(b1, train)
            out = jnp.concatenate([b1, branch2(x)], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    """torchvision-compatible ShuffleNetV2 (default x1.0 widths)."""

    num_classes: int
    stage_repeats: Sequence[int] = (4, 8, 4)
    stage_channels: Sequence[int] = (24, 116, 232, 464, 1024)
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt, fu = self.dtype, self.fused
        x = x.astype(dt)
        x = _ConvBNReLU(
            self.stage_channels[0], 3, 2, dtype=dt, fused=fu, name="conv1"
        )(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for s, (reps, ch) in enumerate(
            zip(self.stage_repeats, self.stage_channels[1:4]), start=2
        ):
            x = InvertedResidual(ch, 2, dtype=dt, fused=fu, name=f"stage{s}_0")(x, train)
            for i in range(1, reps):
                x = InvertedResidual(ch, 1, dtype=dt, fused=fu, name=f"stage{s}_{i}")(
                    x, train
                )
        x = _ConvBNReLU(
            self.stage_channels[4], 1, dtype=dt, fused=fu, name="conv5"
        )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
