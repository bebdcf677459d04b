"""Real-toolchain ONNX round trips.

Every other ONNX test drives graphs emitted by litepi_tpu's own
``onnx_export``; these drive the REAL ``torch.onnx.export`` (torch
torchscript exporter, opset 18) over the four torch mirror models and
ingest the output — closing the residual format risk of hand-assembled
bytes.  Real exporter output exercises what hand-built graphs never
did: ``Constant``/``Shape``/``Gather``/``Unsqueeze`` channel-shuffle
dataflow, ``Identity`` dedup of bit-identical initializers, Clip-form
ReLU6, eval-peephole Conv+BN fusion with anonymous ``onnx::Conv_NNNN``
names.  Reference artifact flow: convert-model-classify.ipynb cells 3-4
(torch -> ONNX before every engine conversion).
"""

import numpy as np
import pytest
import torch

from litepi_tpu.weights.onnx_import import (
    convert_classifier_onnx,
    convert_classifier_onnx_traced,
    read_onnx_graph,
    read_onnx_state_dict,
    run_onnx_graph,
)
from tests.torch_refs import (
    EfficientNetB0T,
    MobileNetV2T,
    ResNet18T,
    ShuffleNetV2T,
    export_real_onnx,
    randomize_bn_stats,
)

pytestmark = pytest.mark.slow

ARCHS = [
    ("shufflenetv2", ShuffleNetV2T),
    ("resnet18", ResNet18T),
    ("mobilenetv2", MobileNetV2T),
    ("efficientnet", EfficientNetB0T),
]


@pytest.fixture(scope="module", params=ARCHS, ids=lambda p: p[0])
def arch_export(request, tmp_path_factory):
    """One mirror model + its real fused and unfused exports."""
    arch, cls = request.param
    torch.manual_seed(0)
    model = cls(num_classes=7)
    randomize_bn_stats(model, seed=1)
    model.eval()
    d = tmp_path_factory.mktemp(arch)
    fused_path = str(d / "fused.onnx")
    unfused_path = str(d / "unfused.onnx")
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(2))
    export_real_onnx(model, x, fused_path, fused=True)
    export_real_onnx(model, x, unfused_path, fused=False)
    with torch.no_grad():
        ref = model(x).numpy()
    return arch, model, x.numpy(), ref, fused_path, unfused_path


@pytest.mark.parametrize("form", ["fused", "unfused"])
def test_interpreter_runs_real_export(arch_export, form):
    """run_onnx_graph executes real exporter output bit-near-exactly."""
    arch, _model, x, ref, fused_path, unfused_path = arch_export
    path = fused_path if form == "fused" else unfused_path
    nodes, inits, gin, gout = read_onnx_graph(path)
    if form == "fused":
        assert not any(n.op == "BatchNormalization" for n in nodes), (
            f"{arch}: expected the eval peephole to fold every BN"
        )
    out = run_onnx_graph(nodes, inits, {gin[0]: x})[gout[0]]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_unfused_export_converts_by_name(arch_export):
    """Name-preserving real export -> converter -> Flax forward parity."""
    from litepi_tpu.models import build_classifier

    arch, _model, x, ref, _fused, unfused_path = arch_export
    variables = convert_classifier_onnx(arch, unfused_path)
    fm = build_classifier(arch, 7)
    got = np.asarray(
        fm.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_state_dict_recovered_through_identity_dedup(arch_export):
    """The exporter dedups bit-identical initializers (all-ones BN scales)
    behind Identity nodes; read_onnx_state_dict must replay them so every
    state-dict weight name resolves."""
    arch, model, _x, _ref, _fused, unfused_path = arch_export
    sd = read_onnx_state_dict(unfused_path)
    want = {
        k: v.numpy()
        for k, v in model.state_dict().items()
        if "num_batches_tracked" not in k
    }
    missing = sorted(set(want) - set(sd))
    assert not missing, f"{arch}: unrecovered keys {missing[:5]}"
    for k, v in want.items():
        np.testing.assert_array_equal(sd[k], v, err_msg=k)


def test_traced_fused_shufflenet_ingests_by_topology(arch_export):
    """Eval-peephole-fused export (anonymous initializer names) binds onto
    the canonical plan by node order and reproduces the torch forward."""
    from litepi_tpu.models import build_classifier

    arch, _model, x, ref, fused_path, _unfused = arch_export
    if arch != "shufflenetv2":
        pytest.skip("topology plan exists for the canonical classifier only")
    variables, ncls = convert_classifier_onnx_traced(fused_path)
    assert ncls == 7
    fm = build_classifier(arch, ncls, fused=True)
    got = np.asarray(
        fm.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_traced_converter_rejects_unfused_graph(arch_export):
    arch, _model, _x, _ref, _fused, unfused_path = arch_export
    if arch != "shufflenetv2":
        pytest.skip("topology plan exists for the canonical classifier only")
    with pytest.raises(ValueError, match="BatchNormalization"):
        convert_classifier_onnx_traced(unfused_path)


def test_convert_cli_ingests_real_fused_export(arch_export):
    """The convert CLI's fallback chain (name-fused -> traced -> unfused)
    routes a REAL fused torch export end-to-end."""
    from litepi_tpu.apps.convert import main
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.checkpoint import load_checkpoint

    arch, _model, x, ref, fused_path, _unfused = arch_export
    if arch != "shufflenetv2":
        pytest.skip("topology plan exists for the canonical classifier only")
    import os

    out = os.path.join(os.path.dirname(fused_path), "ckpt_real_fused")
    assert (
        main(
            ["--arch", "shufflenetv2", "--num_classes", "7",
             "--input", fused_path, "--output", out]
        )
        == 0
    )
    fm = build_classifier(arch, 7, fused=True)
    got = np.asarray(
        fm.apply(
            load_checkpoint(out), np.transpose(x, (0, 2, 3, 1)), train=False
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
