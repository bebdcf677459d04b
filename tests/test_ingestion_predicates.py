"""Fast (no-compile) artifact-routing predicate checks — the smoke-lane
guard against 03eb66e-class regressions, where an ingestion path claims a
graph form it cannot actually convert.

Everything here is numpy-only: converters run, but no Flax module is
applied and nothing is jitted, so the whole file runs in seconds.  It is
part of ``scripts/smoke.bash`` (the mandatory pre-commit gate).
"""

import numpy as np
import pytest
import torch

from tests.test_artifact_ingestion import _onnx_bytes
from tests.torch_refs import ShuffleNetV2T, randomize_bn_stats


@pytest.fixture(scope="module")
def shufflenet_sds():
    """(unfused torchvision-form sd, fused deploy-form sd) for nc=5."""
    torch.manual_seed(2)
    tm = ShuffleNetV2T(num_classes=5)
    randomize_bn_stats(tm, seed=3)
    tm.eval()
    unfused = {k: v.numpy() for k, v in tm.state_dict().items()}

    from litepi_tpu.models.registry import CLASSIFIER_BN_EPS
    from litepi_tpu.weights.fold_bn import fold_pipeline_vars
    from litepi_tpu.weights.ncnn_export import shufflenetv2_fused_state_dict
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx

    variables = convert_classifier_onnx("shufflenetv2", unfused)
    folded, fused_flag = fold_pipeline_vars(variables, eps=CLASSIFIER_BN_EPS)
    assert fused_flag
    return unfused, shufflenetv2_fused_state_dict(folded)


def test_fused_onnx_ingester_rejects_unfused_graph(shufflenet_sds):
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx_fused

    unfused, _ = shufflenet_sds
    with pytest.raises(ValueError, match="fused ShuffleNetV2"):
        convert_classifier_onnx_fused(_onnx_bytes(unfused))


def test_fused_onnx_ingester_accepts_deploy_graph(shufflenet_sds):
    from litepi_tpu.weights.onnx_export import build_classifier_onnx
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx_fused

    _, fused_sd = shufflenet_sds
    data = build_classifier_onnx("shufflenetv2", fused_sd, 5)
    fused_vars, ncls = convert_classifier_onnx_fused(data)
    assert ncls == 5
    # every conv landed with its folded bias
    conv1 = fused_vars["params"]["conv1"]["conv"]
    assert "bias" in conv1 and conv1["bias"].shape == (24,)


def test_unfused_converter_accepts_training_graph(shufflenet_sds):
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx

    unfused, _ = shufflenet_sds
    variables = convert_classifier_onnx(
        "shufflenetv2", _onnx_bytes(unfused)
    )
    assert "batch_stats" in variables


def test_unfused_converter_rejects_folded_graph():
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx

    folded = {"onnx::Conv_123": np.ones((24, 3, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="do_constant_folding"):
        convert_classifier_onnx("shufflenetv2", folded)


def test_fused_onnx_ingester_rejects_partial_deploy_graph(shufflenet_sds):
    """Missing even one conv bias means not deploy form."""
    from litepi_tpu.weights.onnx_export import build_classifier_onnx
    from litepi_tpu.weights.onnx_import import (
        convert_classifier_onnx_fused,
        read_onnx_initializers,
    )

    _, fused_sd = shufflenet_sds
    data = build_classifier_onnx("shufflenetv2", fused_sd, 5)
    inits = read_onnx_initializers(data)
    del inits["conv1.0.bias"]
    with pytest.raises(ValueError, match="conv1.0.bias"):
        convert_classifier_onnx_fused(inits)
