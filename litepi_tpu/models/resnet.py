"""ResNet-18 in Flax (NHWC) — the reference's accuracy-leaning classifier.

Mirrors torchvision's ``resnet18`` layer-for-layer (reference usage:
build_classifier e2e.py:320-347, the ResNet18+NCNN pipeline row in
output_eval/comparison_summary.csv) so `.pth` state dicts convert losslessly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        y = _ConvBN(self.features, 3, self.stride, self.dtype, name="cb1")(x, train)
        y = nn.relu(y)
        y = _ConvBN(self.features, 3, 1, self.dtype, name="cb2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(
                self.features, 1, self.stride, self.dtype, name="down"
            )(x, train)
        return nn.relu(y + identity)


class ResNet18(nn.Module):
    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=dt, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = BasicBlock(
                    features, stride, dtype=dt, name=f"layer{stage + 1}_{i}"
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
