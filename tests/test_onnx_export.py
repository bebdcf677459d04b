"""ONNX graph reading, interpretation and emission.

The reference's real ``yolo_plus.onnx`` (the interchange artifact its NCNN
and OpenVINO conversions start from) survives upstream; these tests use it
as the golden target in both directions:

* read_onnx_graph/run_onnx_graph execute the REAL export and match the
  REAL NCNN copy of the same weights (two independent artifacts, two
  independent interpreters);
* build_detector_onnx(ingest(real)) reproduces the real export's node
  multiset, constant inventory and — the strongest statement — its exact
  execution (bit-equal output on the same input);
* emitted models round-trip through the standard ingestion path and the
  e2e CLI.
"""

import dataclasses
import os

import numpy as np
import pytest

REF = "/root/reference/src"
REAL_ONNX = f"{REF}/vntsr/convert/model/yolo_plus/yolo_plus.onnx"
V1_PARAM = (
    f"{REF}/vntsr/convert/model/yolo_plus/yolo_plus_ncnn_model/"
    "model.ncnn.param"
)
V1_BIN = os.path.splitext(V1_PARAM)[0] + ".bin"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def _real_v1_sd():
    from litepi_tpu.core.types import YOLO_PLUS_V1
    from litepi_tpu.weights.ncnn_import import (
        ncnn_state_dict,
        parse_ncnn_param,
        read_ncnn_bin,
    )

    layers = parse_ncnn_param(V1_PARAM)
    read_ncnn_bin(layers, V1_BIN)
    return ncnn_state_dict(layers, YOLO_PLUS_V1)


def _canon_node(n):
    return (
        n.op,
        tuple(sorted(
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in n.attrs.items()
        )),
        len(n.inputs),
        len(n.outputs),
    )


@needs_reference
def test_real_onnx_executes_like_real_ncnn():
    """Cross-artifact differential: the real yolo_plus.onnx through
    run_onnx_graph equals the real NCNN pair through run_ncnn_graph (same
    exported weights, fp16 NCNN storage bounds the diff)."""
    from litepi_tpu.weights.ncnn_import import (
        parse_ncnn_param,
        read_ncnn_bin,
        run_ncnn_graph,
    )
    from litepi_tpu.weights.onnx_import import read_onnx_graph, run_onnx_graph

    nodes, inits, gin, gout = read_onnx_graph(REAL_ONNX)
    assert (gin, gout) == (["images"], ["output0"])
    rng = np.random.RandomState(42)
    img = rng.rand(3, 640, 640).astype(np.float32)
    out_onnx = run_onnx_graph(nodes, inits, {"images": img[None]})["output0"][0]

    layers = parse_ncnn_param(V1_PARAM)
    read_ncnn_bin(layers, V1_BIN)
    out_ncnn = run_ncnn_graph(layers, img)
    np.testing.assert_allclose(out_onnx[:4], out_ncnn[:4], atol=2e-3)
    np.testing.assert_allclose(out_onnx[4:], out_ncnn[4:], atol=1e-5)


@needs_reference
def test_emitted_onnx_reconstructs_real_export():
    """export(ingest(real NCNN)) reproduces the real ONNX export: node
    multiset, decode-constant inventory (names+values), weight
    initializers bit-exact, and EXECUTION bit-equal."""
    from collections import Counter

    from litepi_tpu.core.types import YOLO_PLUS_V1
    from litepi_tpu.weights.onnx_export import build_detector_onnx
    from litepi_tpu.weights.onnx_import import read_onnx_graph, run_onnx_graph

    data = build_detector_onnx(YOLO_PLUS_V1, _real_v1_sd())
    ne, ie, _, _ = read_onnx_graph(data)
    nr, ir, _, _ = read_onnx_graph(REAL_ONNX)

    assert Counter(map(_canon_node, ne)) == Counter(map(_canon_node, nr))
    consts_e = {k: v for k, v in ie.items() if not k.startswith("model.")}
    consts_r = {k: v for k, v in ir.items() if not k.startswith("model.")}
    assert set(consts_e) == set(consts_r)
    for k in consts_r:
        np.testing.assert_allclose(
            consts_e[k].astype(np.float64), consts_r[k].astype(np.float64)
        )
    for k in ir:
        if k.startswith("model."):
            np.testing.assert_array_equal(ie[k], ir[k])

    rng = np.random.RandomState(7)
    img = rng.rand(1, 3, 640, 640).astype(np.float32)
    oe = run_onnx_graph(ne, ie, {"images": img})["output0"]
    orl = run_onnx_graph(nr, ir, {"images": img})["output0"]
    np.testing.assert_array_equal(oe, orl)  # bit-equal


def test_emitted_onnx_runs_like_flax_model():
    """Small-size emission: the emitted graph through run_onnx_graph
    equals YoloLitePi + our decode; re-ingesting the bytes through the
    standard converter reproduces the forward."""
    import jax
    import jax.numpy as jnp

    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.models.yolo import YoloLitePi
    from litepi_tpu.ops.anchors import make_anchors
    from litepi_tpu.ops.dfl import decode_boxes, dfl_decode
    from litepi_tpu.weights.ncnn_export import detector_fused_state_dict
    from litepi_tpu.weights.onnx_export import build_detector_onnx
    from litepi_tpu.weights.onnx_import import (
        convert_detector_onnx,
        read_onnx_graph,
        run_onnx_graph,
    )

    cfg = dataclasses.replace(YOLO_PLUS_V2, input_size=160)
    model = YoloLitePi(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    data = build_detector_onnx(
        cfg, detector_fused_state_dict(variables, cfg)
    )
    nodes, inits, _, _ = read_onnx_graph(data)

    rng = np.random.RandomState(9)
    img = rng.rand(3, 160, 160).astype(np.float32)
    out_graph = run_onnx_graph(nodes, inits, {"images": img[None]})[
        "output0"
    ][0]

    out = model.apply(
        variables, jnp.asarray(img.transpose(1, 2, 0))[None], train=False
    )
    pts, strides = make_anchors(cfg.input_size, cfg.strides)
    dist = dfl_decode(out["reg"], cfg.reg_max)
    boxes = decode_boxes(
        dist, jnp.asarray(pts), jnp.asarray(strides), xywh=True
    )
    cls = jax.nn.sigmoid(out["cls"].astype(jnp.float32))
    ours = np.concatenate(
        [np.asarray(boxes[0]).T, np.asarray(cls[0]).T], axis=0
    )
    np.testing.assert_allclose(ours[:4], out_graph[:4], atol=2e-3)
    np.testing.assert_allclose(ours[4:], out_graph[4:], atol=1e-5)

    # standard ingestion round trip on the emitted bytes
    v2 = convert_detector_onnx(data, cfg.depths)
    o2 = model.apply(v2, jnp.asarray(img.transpose(1, 2, 0))[None], train=False)
    np.testing.assert_allclose(
        np.asarray(o2["cls"]), np.asarray(out["cls"]), atol=1e-5
    )


def test_convert_cli_emit_onnx(tmp_path):
    import jax

    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.models.yolo import YoloLitePi
    from litepi_tpu.weights.checkpoint import save_checkpoint
    from litepi_tpu.weights.onnx_import import read_onnx_initializers

    model = YoloLitePi(YOLO_PLUS_V2)
    variables = model.init(
        jax.random.PRNGKey(1), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables)
    out = tmp_path / "model.onnx"
    rc = convert_main(
        [
            "--arch", "yolo_plus_v2", "--num_classes", "1",
            "--input", str(ckpt), "--output", str(out), "--emit", "onnx",
        ]
    )
    assert rc == 0
    inits = read_onnx_initializers(str(out))
    assert "model.0.conv.weight" in inits
    # classifier arch is rejected with guidance
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "5",
            "--input", str(ckpt), "--output", str(out), "--emit", "onnx",
        ]
    )
    assert rc == 2


# --------------------------------------------------------------------------- #
# classifier emission (ShuffleNetV2)
# --------------------------------------------------------------------------- #


def _shufflenet_vars(num_classes=7, seed=0):
    import jax

    from litepi_tpu.models import build_classifier

    model = build_classifier("shufflenetv2", num_classes)
    variables = model.init(
        jax.random.PRNGKey(seed), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    return model, variables


def test_emitted_shufflenet_onnx_runs_like_flax_model():
    """No classifier ONNX survives upstream, so validation is forward
    parity: the emitted graph (grouped depthwise Convs, Split halves,
    Reshape/Transpose/Reshape channel shuffle, ReduceMean, Gemm) through
    the interpreter equals the Flax model's logits."""
    import jax.numpy as jnp

    from litepi_tpu.weights.ncnn_export import shufflenetv2_fused_state_dict
    from litepi_tpu.weights.onnx_export import build_classifier_onnx
    from litepi_tpu.weights.onnx_import import read_onnx_graph, run_onnx_graph

    model, variables = _shufflenet_vars(7)
    sd = shufflenetv2_fused_state_dict(variables)
    data = build_classifier_onnx("shufflenetv2", sd, 7)
    nodes, inits, _ins, _outs = read_onnx_graph(data)

    rng = np.random.RandomState(11)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    out_graph = run_onnx_graph(nodes, inits, {"images": img})["output0"][0]

    ours = np.asarray(
        model.apply(
            variables, jnp.asarray(img[0].transpose(1, 2, 0))[None],
            train=False,
        )
    )[0]
    assert out_graph.shape == ours.shape == (7,)
    np.testing.assert_allclose(out_graph, ours, atol=1e-4)


def test_classifier_onnx_export_reingest_roundtrip(tmp_path):
    """emit -> convert_classifier_onnx_fused -> ShuffleNetV2(fused=True)
    forward equals the source model's (fp32 weights bit-exact through the
    protobuf wire)."""
    import jax.numpy as jnp

    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.onnx_export import export_classifier_onnx
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx_fused

    model, variables = _shufflenet_vars(9, seed=3)
    path = tmp_path / "clf.onnx"
    export_classifier_onnx("shufflenetv2", variables, 9, str(path))
    fused_vars, ncls = convert_classifier_onnx_fused(str(path))
    assert ncls == 9
    fused_model = build_classifier("shufflenetv2", 9, fused=True)
    x = jnp.asarray(
        np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    )
    o1 = np.asarray(model.apply(variables, x, train=False))
    o2 = np.asarray(fused_model.apply(fused_vars, x, train=False))
    np.testing.assert_allclose(o2, o1, atol=1e-4)


def test_convert_cli_emit_onnx_classifier(tmp_path):
    import jax

    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.weights.checkpoint import save_checkpoint
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx_fused

    _, variables = _shufflenet_vars(5, seed=1)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables)
    out = tmp_path / "clf.onnx"
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "5",
            "--input", str(ckpt), "--output", str(out), "--emit", "onnx",
        ]
    )
    assert rc == 0
    _, ncls = convert_classifier_onnx_fused(str(out))
    assert ncls == 5
    # other classifier archs are rejected with guidance
    rc = convert_main(
        [
            "--arch", "resnet18", "--num_classes", "5",
            "--input", str(ckpt), "--output", str(out), "--emit", "onnx",
        ]
    )
    assert rc == 2


def test_export_classifier_onnx_rejects_other_archs(tmp_path):
    from litepi_tpu.weights.onnx_export import export_classifier_onnx

    _, variables = _shufflenet_vars(5)
    with pytest.raises(ValueError, match="shufflenetv2"):
        export_classifier_onnx(
            "resnet18", variables, 5, str(tmp_path / "x.onnx")
        )


def test_convert_classifier_onnx_fused_rejects_detector_graph():
    from tests.test_ncnn_export import _flax_fused_sd

    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.weights.onnx_export import build_detector_onnx
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx_fused

    sd, _ = _flax_fused_sd(YOLO_PLUS_V2)
    data = build_detector_onnx(YOLO_PLUS_V2, sd)
    with pytest.raises(ValueError, match="ShuffleNetV2"):
        convert_classifier_onnx_fused(data)


def test_convert_cli_ingests_classifier_onnx(tmp_path):
    """An emitted (fused) classifier ONNX converts back to an orbax
    checkpoint through the fused ingestion path."""
    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.weights.onnx_export import export_classifier_onnx

    _, variables = _shufflenet_vars(4, seed=5)
    onnx_p = tmp_path / "clf.onnx"
    export_classifier_onnx("shufflenetv2", variables, 4, str(onnx_p))
    out = tmp_path / "ckpt"
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "4",
            "--input", str(onnx_p), "--output", str(out),
        ]
    )
    assert rc == 0
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "9",
            "--input", str(onnx_p), "--output", str(out),
        ]
    )
    assert rc == 2
