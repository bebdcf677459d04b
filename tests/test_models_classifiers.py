"""Classifier parity: Flax models + torch_import converter vs torch mirrors.

This is the framework's version of the reference's export smoke test pattern
(seeded input through the converted graph, compare against the source model —
SURVEY §4 item 1 / model_ncnn.py:5-26), promoted to a real assertion.
"""

import numpy as np
import pytest
import torch

from litepi_tpu.models import build_classifier
from litepi_tpu.weights.torch_import import convert_classifier_state_dict
from tests.torch_refs import ResNet18T, ShuffleNetV2T, randomize_bn_stats


def _to_numpy_sd(model: torch.nn.Module):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _parity(arch, torch_model, num_classes, size=64, atol=1e-4, batch=2):
    torch.manual_seed(0)
    randomize_bn_stats(torch_model, seed=1)
    torch_model.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    flax_model = build_classifier(arch, num_classes)
    variables = convert_classifier_state_dict(arch, _to_numpy_sd(torch_model))
    got = np.asarray(flax_model.apply(variables, x, train=False))

    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_shufflenetv2_matches_torch():
    _parity("shufflenetv2", ShuffleNetV2T(num_classes=91), 91)


def test_resnet18_matches_torch():
    _parity("resnet18", ResNet18T(num_classes=49), 49)


def test_mobilenetv2_matches_torch():
    from tests.torch_refs import MobileNetV2T

    _parity("mobilenetv2", MobileNetV2T(num_classes=49), 49)


def test_efficientnet_b0_matches_torch():
    from tests.torch_refs import EfficientNetB0T

    _parity("efficientnet", EfficientNetB0T(num_classes=91), 91, atol=3e-4)


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="unknown classifier arch"):
        build_classifier("vgg", 10)
