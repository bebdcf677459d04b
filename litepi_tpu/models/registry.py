"""Classifier registry mirroring the reference's ``build_classifier``
(reference: e2e.py:320-347, --clf_arch choices e2e.py:1014-1050)."""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
from flax import linen as nn

from litepi_tpu.models.efficientnet import EfficientNetB0
from litepi_tpu.models.mobilenetv2 import MobileNetV2
from litepi_tpu.models.resnet import ResNet18
from litepi_tpu.models.shufflenetv2 import ShuffleNetV2

CLASSIFIER_REGISTRY: Dict[str, Callable[..., nn.Module]] = {
    "shufflenetv2": ShuffleNetV2,
    "resnet18": ResNet18,
    "mobilenetv2": MobileNetV2,
    "efficientnet": EfficientNetB0,
}


# all four classifiers use torchvision's BatchNorm2d default epsilon
CLASSIFIER_BN_EPS = 1e-5


def build_classifier(
    arch: str,
    num_classes: int,
    dtype: jnp.dtype = jnp.float32,
    fused: bool = False,
) -> nn.Module:
    """Instantiate a classifier by the reference's --clf_arch name.

    ``fused=True`` builds the deploy form (biased convs, BN pre-folded via
    weights/fold_bn.py with eps CLASSIFIER_BN_EPS)."""
    if arch not in CLASSIFIER_REGISTRY:
        raise ValueError(
            f"unknown classifier arch {arch!r}; "
            f"choices: {sorted(CLASSIFIER_REGISTRY)}"
        )
    return CLASSIFIER_REGISTRY[arch](
        num_classes=num_classes, dtype=dtype, fused=fused
    )
