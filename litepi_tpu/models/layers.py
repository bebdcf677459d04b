"""Shared Flax building blocks for the detector family.

The reference's detector blocks exist only as an exported NCNN/ONNX graph
(reference: src/tt100k/convert/model/yolo_plus/yolo_plus_ncnn_model/
model.ncnn.param) produced from a YOLOv8-style YAML (reference:
train_model/train-yolo-custom-tt100k.ipynb cell 30).  Here they are native
Flax modules in NHWC layout, the layout XLA tiles best onto the TPU MXU.

Numerical conventions (chosen for torch-weight-import parity):

* convs use explicit symmetric ``k // 2`` padding — NOT 'SAME', whose
  asymmetric padding at even sizes diverges from torch;
* BatchNorm uses eps 1e-3 / momentum 0.97 (flax momentum = 1 - torch 0.03);
* activation is SiLU;
* params stay float32, compute may run in bfloat16 (``dtype``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv2D + BatchNorm + optional SiLU (the reference graph's fused
    conv/swish unit, e.g. model.ncnn.param:4-7).

    ``fused=True`` builds the DEPLOY form: a biased conv with no BN — the
    exact inference-time algebra of Conv+BN once the running stats are
    folded into the kernel/bias (weights/fold_bn.py::fold_batchnorm).  The
    reference ships exactly this form (its exported NCNN convs carry bias,
    model.ncnn.param).  Measured motivation: unfused inference BN lowers to
    a separate elementwise divide/multiply pass over every activation map
    (~3 ms/step of pure HBM traffic on the B=128 detector, round-2b
    profile); folding removes those passes.  Training always uses the
    unfused form (``fused`` and ``train`` are mutually exclusive).
    """

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    padding: int = -1  # -1 -> k // 2 autopad; >= 0 -> explicit
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel // 2 if self.padding < 0 else self.padding
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
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                name="bn",
            )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    """Two 3x3 ConvBN with optional residual (YOLOv8 C2f inner block)."""

    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBN(
            self.features, 3, dtype=self.dtype, fused=self.fused, name="cv1"
        )(x, train)
        y = ConvBN(
            self.features, 3, dtype=self.dtype, fused=self.fused, name="cv2"
        )(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with ``n`` bottlenecks.

    Split the 1x1-projected input into two halves, push one half through a
    chain of bottlenecks appending every intermediate, then fuse with a final
    1x1 (the reference graph's repeating split/concat motif,
    model.ncnn.param:8-19).
    """

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.features // 2
        y = ConvBN(
            2 * hidden, 1, dtype=self.dtype, fused=self.fused, name="cv1"
        )(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for i in range(self.n):
            b = Bottleneck(
                hidden, self.shortcut, dtype=self.dtype, fused=self.fused,
                name=f"m{i}",
            )(b, train)
            outs.append(b)
        y = jnp.concatenate(outs, axis=-1)
        return ConvBN(
            self.features, 1, dtype=self.dtype, fused=self.fused, name="cv2"
        )(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three chained 5x5 max-pools
    (model.ncnn.param SPPF section — pools at stride 1, pad 2)."""

    features: int
    pool: int = 5
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = x.shape[-1] // 2
        x = ConvBN(
            hidden, 1, dtype=self.dtype, fused=self.fused, name="cv1"
        )(x, train)
        pad = self.pool // 2
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1],
                    (self.pool, self.pool),
                    strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                )
            )
        y = jnp.concatenate(pools, axis=-1)
        return ConvBN(
            self.features, 1, dtype=self.dtype, fused=self.fused, name="cv2"
        )(y, train)


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (the PAN top-down path's Upsample).
    Implemented as repeat — XLA lowers this to a cheap broadcast, no gather."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
