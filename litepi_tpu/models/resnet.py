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
            use_bias=self.fused,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.fused:
            return x
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
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        fu = self.fused
        y = _ConvBN(self.features, 3, self.stride, self.dtype, fu, name="cb1")(x, train)
        y = nn.relu(y)
        y = _ConvBN(self.features, 3, 1, self.dtype, fu, name="cb2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(
                self.features, 1, self.stride, self.dtype, fu, name="down"
            )(x, train)
        return nn.relu(y + identity)


class BottleneckBlock(nn.Module):
    """ResNet v1.5 bottleneck (1x1 reduce, 3x3 stride, 1x1 expand x4)."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_c = self.features * 4
        identity = x
        y = nn.relu(_ConvBN(self.features, 1, 1, self.dtype, name="cb1")(x, train))
        y = nn.relu(
            _ConvBN(self.features, 3, self.stride, self.dtype, name="cb2")(y, train)
        )
        y = _ConvBN(out_c, 1, 1, self.dtype, name="cb3")(y, train)
        if self.stride != 1 or x.shape[-1] != out_c:
            identity = _ConvBN(out_c, 1, self.stride, self.dtype, name="down")(
                x, train
            )
        return nn.relu(y + identity)


class ResNet50Backbone(nn.Module):
    """ResNet-50 feature extractor returning C2..C5 (strides 4/8/16/32) —
    the Faster-RCNN backbone (reference baselines train
    fasterrcnn_resnet50_fpn, train-other-model-tsd-*.ipynb cell 11)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
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
        feats = []
        for stage, blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** stage)
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = BottleneckBlock(
                    width, stride, dtype=dt, name=f"layer{stage + 1}_{i}"
                )(x, train)
            feats.append(x)
        return tuple(feats)  # C2 (256ch) .. C5 (2048ch)


class ResNet18(nn.Module):
    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt, fu = self.dtype, self.fused
        if fu and train:
            raise ValueError("fused model has no batch stats to train")
        x = x.astype(dt)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=fu, dtype=dt, name="conv1",
        )(x)
        if not fu:
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
                    features, stride, dtype=dt, fused=fu,
                    name=f"layer{stage + 1}_{i}"
                )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32)
        )
