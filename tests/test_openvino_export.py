"""OpenVINO IR interpretation and emission.

The reference ships its detector as OpenVINO IR (one of three backends,
runner.py:175-222), and the real vntsr v1 ``yolo_plus.xml``/``.bin`` pair
survives the upstream blob strip; these tests use it as the golden target
in both directions:

* run_ir_graph executes the REAL IR and matches the REAL NCNN copy of
  the same weights bit-for-bit (two independent artifacts, two
  independent interpreters);
* build_detector_ir(ingest(real NCNN)) reproduces the real IR's layer
  inventory (named layers one-by-one, anonymous constants by value) and
  — the strongest statement — its exact execution (bit-equal output);
* emitted IRs round-trip through the standard ingestion path and the
  convert CLI.
"""

import dataclasses
import os
import re

import numpy as np
import pytest

REF = "/root/reference/src"
OV_DIR = f"{REF}/vntsr/convert/model/yolo_plus/yolo_plus_openvino_model"
REAL_XML = f"{OV_DIR}/yolo_plus.xml"
REAL_BIN = f"{OV_DIR}/yolo_plus.bin"
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


def _canon_name(name: str) -> str:
    """Comparison key for IR layer names.  Deterministic trace names
    (``__module.*``/``self.*``) keep their module path; the shared-SiLU
    Swish counter, bare tensor-number names ('109', '727'), anonymous
    ``Constant_NNNNN`` and ``Result_NNNNN`` collapse to their kind (their
    numeric suffixes are trace-order artifacts, not structure)."""
    if re.fullmatch(r"\d+", name):
        return "<tensor-const>"
    if re.fullmatch(r"Constant_\d+", name):
        return "<anon-const>"
    if re.fullmatch(r"Result_\d+", name):
        return "Result"
    if "/aten::silu_/Swish" in name:
        return "<swish>"
    return name


def _inventory(xml_path):
    """{canonical name or kind: multiset of (type, data-sans-offset,
    out-shapes)} — offsets differ between blobs, everything else is
    structural."""
    import xml.etree.ElementTree as ET
    from collections import Counter

    inv = Counter()
    root = ET.parse(xml_path).getroot()
    for el in root.find("layers"):
        data_el = el.find("data")
        data = dict(data_el.attrib) if data_el is not None else {}
        data.pop("offset", None)
        # canonicalize numeric formatting ("1,3,640,640" vs "1, 3, 640, 640")
        data = {k: v.replace(" ", "") for k, v in data.items()}
        outs = []
        out_el = el.find("output")
        if out_el is not None:
            for port in out_el:
                outs.append(tuple(int(d.text) for d in port.findall("dim")))
        inv[
            (
                _canon_name(el.get("name")),
                el.get("type"),
                tuple(sorted(data.items())),
                tuple(outs),
            )
        ] += 1
    edges = len(list(root.find("edges")))
    return inv, edges


@needs_reference
def test_ir_interpreter_matches_real_ncnn():
    """Cross-artifact differential: the real yolo_plus.xml through
    run_ir_graph equals the real NCNN pair through run_ncnn_graph on the
    same input (same exported weights; the IR stores fp32, NCNN fp16 —
    both interpreters compute in fp32 from the same fp16-rounded values,
    so the match is exact)."""
    from litepi_tpu.weights.ncnn_import import (
        parse_ncnn_param,
        read_ncnn_bin,
        run_ncnn_graph,
    )
    from litepi_tpu.weights.openvino_import import run_ir_graph

    rng = np.random.RandomState(42)
    img = rng.rand(3, 640, 640).astype(np.float32)
    out_ir = run_ir_graph(REAL_XML, REAL_BIN, img[None])[0]

    layers = parse_ncnn_param(V1_PARAM)
    read_ncnn_bin(layers, V1_BIN)
    out_ncnn = np.asarray(run_ncnn_graph(layers, img))
    np.testing.assert_array_equal(out_ir, out_ncnn.reshape(out_ir.shape))


@needs_reference
def test_emitted_ir_reconstructs_real_export():
    """export(ingest(real NCNN)) reproduces the real IR: layer inventory
    (named layers one-by-one, trace-numbered ones by kind), edge count,
    decode-constant values, and EXECUTION bit-equal."""
    from litepi_tpu.core.types import YOLO_PLUS_V1
    from litepi_tpu.weights.openvino_export import build_detector_ir
    from litepi_tpu.weights.openvino_import import run_ir_graph

    xml_data, bin_data = build_detector_ir(YOLO_PLUS_V1, _real_v1_sd())
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        xml_p = os.path.join(d, "m.xml")
        with open(xml_p, "wb") as f:
            f.write(xml_data)

        inv_e, edges_e = _inventory(xml_p)
        inv_r, edges_r = _inventory(REAL_XML)
        assert edges_e == edges_r
        missing = inv_r - inv_e
        extra = inv_e - inv_r
        assert not missing and not extra, (
            f"missing from emission: {sorted(missing)[:5]}; "
            f"extra in emission: {sorted(extra)[:5]}"
        )

        # anonymous-constant VALUES (reshape targets, split sizes, anchor
        # table, stride row, decode scalars) — bit-compare as multisets
        def _const_values(path, blob):
            import xml.etree.ElementTree as ET

            from litepi_tpu.weights.openvino_import import (
                _const_array,
                parse_openvino_xml,
            )

            g = parse_openvino_xml(path)
            vals = []
            for l in g.layers.values():
                if l.type == "Const" and not l.name.startswith("self."):
                    a = _const_array(l, blob)
                    vals.append((str(a.dtype), a.shape, a.tobytes()))
            return sorted(vals)

        assert _const_values(xml_p, bin_data) == _const_values(
            REAL_XML, open(REAL_BIN, "rb").read()
        )

        rng = np.random.RandomState(7)
        img = rng.rand(1, 3, 640, 640).astype(np.float32)
        out_e = run_ir_graph(xml_p, bin_data, img)
        out_r = run_ir_graph(REAL_XML, REAL_BIN, img)
        np.testing.assert_array_equal(out_e, out_r)  # bit-equal


@needs_reference
def test_emitted_ir_round_trips_through_ingestion():
    """The standard OpenVINO ingestion path (topology verify + state-dict
    recovery + converter) accepts an emitted pair and reproduces the
    source variables bit-exactly."""
    import tempfile

    import jax

    from litepi_tpu.weights.ncnn_import import convert_detector_ncnn
    from litepi_tpu.weights.openvino_export import export_detector_openvino
    from litepi_tpu.weights.openvino_import import convert_detector_openvino

    variables, cfg = convert_detector_ncnn(V1_PARAM, V1_BIN)
    with tempfile.TemporaryDirectory() as d:
        xml_p = os.path.join(d, "m.xml")
        export_detector_openvino(variables, cfg, xml_p)
        v2, cfg2 = convert_detector_openvino(
            xml_p, os.path.join(d, "m.bin")
        )
    assert cfg2.name == cfg.name
    flat1 = jax.tree_util.tree_leaves_with_path(variables)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(v2))
    assert len(flat1) == len(flat2)
    for k, a in flat1:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(flat2[k]))


def test_emitted_ir_runs_like_flax_model():
    """Small-size emission from fresh Flax variables: the emitted IR
    through run_ir_graph equals YoloLitePi + our decode ops."""
    import jax
    import jax.numpy as jnp

    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.models.yolo import YoloLitePi
    from litepi_tpu.ops.anchors import make_anchors
    from litepi_tpu.ops.dfl import decode_boxes, dfl_decode
    from litepi_tpu.weights.ncnn_export import detector_fused_state_dict
    from litepi_tpu.weights.openvino_export import build_detector_ir
    from litepi_tpu.weights.openvino_import import (
        parse_openvino_xml,
        run_ir_graph,
    )

    cfg = dataclasses.replace(YOLO_PLUS_V2, input_size=160)
    model = YoloLitePi(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    xml_data, bin_data = build_detector_ir(
        cfg, detector_fused_state_dict(variables, cfg)
    )
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".xml") as f:
        f.write(xml_data)
        f.flush()
        g = parse_openvino_xml(f.name)
    rng = np.random.RandomState(9)
    img = rng.rand(3, 160, 160).astype(np.float32)
    out_graph = run_ir_graph(g, bin_data, img[None])[0]

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


# --------------------------------------------------------------------------- #
# baseline-variant emission (yolov5nu / yolov11n)
# --------------------------------------------------------------------------- #


@needs_reference
@pytest.mark.parametrize("tree", ["tt100k", "vntsr"])
def test_emitted_v5u_ir_matches_real_export(tree, tmp_path):
    """The deployed 'yolo5' baseline: emitted IR must reproduce BOTH
    trees' shipped yolo5.xml layer inventories (named layers one-by-one
    on type/attrs/shapes, anonymous ones by kind) and edge counts —
    covers the C3 emission, the k=6 p=2 stem, the two 1x1 neck reduce
    convs and the model.24 head.  (Both baseline .bins are stripped
    upstream, so structure is what is checkable.)"""
    from tests.test_ncnn_export import _v5u_fused_sd

    from litepi_tpu.weights.openvino_export import build_variant_ir

    sd, _ = _v5u_fused_sd()
    xml_data, _bin = build_variant_ir("yolov5nu", sd)
    xml_p = tmp_path / "v5u.xml"
    xml_p.write_bytes(xml_data)
    inv_e, edges_e = _inventory(str(xml_p))
    inv_r, edges_r = _inventory(
        f"{REF}/{tree}/convert/model/yolo5/yolo5_openvino_model/yolo5.xml"
    )
    assert edges_e == edges_r
    missing = inv_r - inv_e
    extra = inv_e - inv_r
    assert not missing and not extra, (
        f"missing from emission: {sorted(missing)[:5]}; "
        f"extra in emission: {sorted(extra)[:5]}"
    )


@needs_reference
@pytest.mark.parametrize("tree", ["tt100k", "vntsr"])
def test_emitted_v11_ir_matches_real_export(tree, tmp_path):
    """yolov11n: emitted IR reproduces both shipped yolo11.xml
    inventories — covers C3k2/C3k emission, the traced C2PSA attention
    (qkv view, MatMul transpose_a/b pair, scale Multiply, softmax(-1),
    GroupConvolution positional conv) and the depthwise-separable cls
    head at model.23."""
    from tests.test_ncnn_export import _v11_fused_sd

    from litepi_tpu.weights.openvino_export import build_variant_ir

    sd, _ = _v11_fused_sd()
    xml_data, _bin = build_variant_ir("yolov11n", sd)
    xml_p = tmp_path / "v11.xml"
    xml_p.write_bytes(xml_data)
    inv_e, edges_e = _inventory(str(xml_p))
    inv_r, edges_r = _inventory(
        f"{REF}/{tree}/convert/model/yolo11/yolo11_openvino_model/yolo11.xml"
    )
    assert edges_e == edges_r
    missing = inv_r - inv_e
    extra = inv_e - inv_r
    assert not missing and not extra, (
        f"missing from emission: {sorted(missing)[:5]}; "
        f"extra in emission: {sorted(extra)[:5]}"
    )


def _variant_forward_parity(variant, model, variables, sd, rng_seed):
    """Emitted variant IR through run_ir_graph equals the Flax model +
    our decode ops at a small input size."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from litepi_tpu.ops.anchors import make_anchors
    from litepi_tpu.ops.dfl import decode_boxes, dfl_decode
    from litepi_tpu.weights.openvino_export import build_variant_ir
    from litepi_tpu.weights.openvino_import import (
        parse_openvino_xml,
        run_ir_graph,
    )

    size = 160
    xml_data, bin_data = build_variant_ir(variant, sd, input_size=size)
    with tempfile.NamedTemporaryFile(suffix=".xml") as f:
        f.write(xml_data)
        f.flush()
        g = parse_openvino_xml(f.name)
    rng = np.random.RandomState(rng_seed)
    img = rng.rand(3, size, size).astype(np.float32)
    out_graph = run_ir_graph(g, bin_data, img[None])[0]

    out = model.apply(
        variables, jnp.asarray(img.transpose(1, 2, 0))[None], train=False
    )
    pts, strides = make_anchors(size)
    dist = dfl_decode(out["reg"], 16)
    boxes = decode_boxes(
        dist, jnp.asarray(pts), jnp.asarray(strides), xywh=True
    )
    cls = jax.nn.sigmoid(out["cls"].astype(jnp.float32))
    ours = np.concatenate(
        [np.asarray(boxes[0]).T, np.asarray(cls[0]).T], axis=0
    )
    assert out_graph.shape == ours.shape
    np.testing.assert_allclose(ours[:4], out_graph[:4], atol=2e-3)
    np.testing.assert_allclose(ours[4:], out_graph[4:], atol=1e-5)


def test_emitted_v5u_ir_runs_like_flax_model():
    from tests.test_ncnn_export import _v5u_fused_sd

    from litepi_tpu.models.yolov5 import YoloV5

    sd, variables = _v5u_fused_sd()
    _variant_forward_parity(
        "yolov5nu", YoloV5(num_classes=1, anchor_free=True), variables, sd, 3
    )


def test_emitted_v11_ir_runs_like_flax_model():
    """Includes the attention subgraph: the IR's MatMul/softmax chain on
    the torch heads-major qkv layout must equal YoloV11's branch-major
    attention (exact 1/sqrt(kd) scale — the IR stores the traced float,
    unlike pnnx's 6-digit fold, so tolerances stay at conv-order level)."""
    from tests.test_ncnn_export import _v11_fused_sd

    from litepi_tpu.models.yolov11 import YoloV11

    sd, variables = _v11_fused_sd()
    _variant_forward_parity(
        "yolov11n", YoloV11(num_classes=1), variables, sd, 5
    )


def _variant_reingest_parity(variant, model, variables, tmp_path):
    """export -> convert_detector_openvino_variant -> forward parity.
    Source is train-form (conv+bn); re-ingest is deploy-keyed with
    identity BN — compare through the fused forward instead of trees
    (same contract as the NCNN round-trip tests)."""
    import jax.numpy as jnp

    from litepi_tpu.weights.openvino_export import (
        export_detector_openvino_variant,
    )
    from litepi_tpu.weights.openvino_import import (
        convert_detector_openvino_variant,
    )

    xml_p = tmp_path / "m.xml"
    export_detector_openvino_variant(variables, variant, str(xml_p))
    v2 = convert_detector_openvino_variant(
        str(xml_p), str(tmp_path / "m.bin"), variant
    )
    x = jnp.asarray(
        np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    )
    o1 = model.apply(variables, x, train=False)
    o2 = model.apply(v2, x, train=False)
    np.testing.assert_allclose(
        np.asarray(o1["cls"]), np.asarray(o2["cls"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1["reg"]), np.asarray(o2["reg"]), atol=1e-4
    )


def test_v5u_ir_export_reingest_roundtrip(tmp_path):
    from tests.test_ncnn_export import _v5u_fused_sd

    from litepi_tpu.models.yolov5 import YoloV5

    _, variables = _v5u_fused_sd()
    _variant_reingest_parity(
        "yolov5nu", YoloV5(num_classes=1, anchor_free=True), variables,
        tmp_path,
    )


def test_v11_ir_export_reingest_roundtrip(tmp_path):
    """v11 round trip: the qkv heads-major re-packing at export must
    compose with ingestion's permutation to the identity."""
    from tests.test_ncnn_export import _v11_fused_sd

    from litepi_tpu.models.yolov11 import YoloV11

    _, variables = _v11_fused_sd()
    _variant_reingest_parity(
        "yolov11n", YoloV11(num_classes=1), variables, tmp_path
    )


def test_convert_cli_emit_openvino(tmp_path):
    import jax

    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.models.yolo import YoloLitePi
    from litepi_tpu.weights.checkpoint import save_checkpoint
    from litepi_tpu.weights.openvino_import import openvino_state_dict

    model = YoloLitePi(YOLO_PLUS_V2)
    variables = model.init(
        jax.random.PRNGKey(1), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables)
    out = tmp_path / "export"
    rc = convert_main(
        [
            "--arch", "yolo_plus_v2", "--num_classes", "1",
            "--input", str(ckpt), "--output", str(out),
            "--emit", "openvino",
        ]
    )
    assert rc == 0
    assert (out / "model.xml").exists() and (out / "model.bin").exists()
    assert (out / "metadata.yaml").exists()
    sd = openvino_state_dict(str(out / "model.xml"), str(out / "model.bin"))
    assert "model.0.conv.weight" in sd and "model.0.conv.bias" in sd
    # classifier arch is rejected with guidance
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "5",
            "--input", str(ckpt), "--output", str(out),
            "--emit", "openvino",
        ]
    )
    assert rc == 2


def test_convert_cli_emit_openvino_variant(tmp_path):
    """--emit openvino on a baseline-variant arch (yolov5n) emits the
    deployed yolo5.xml structure and the pair re-ingests through the
    variant loader."""
    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.weights.checkpoint import save_checkpoint
    from litepi_tpu.weights.openvino_import import (
        convert_detector_openvino_variant,
    )

    from tests.test_ncnn_export import _v5u_fused_sd

    _, variables = _v5u_fused_sd()
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables)
    out = tmp_path / "export"
    rc = convert_main(
        [
            "--arch", "yolov5n", "--num_classes", "1",
            "--input", str(ckpt), "--output", str(out),
            "--emit", "openvino", "--emit_input_size", "320",
        ]
    )
    assert rc == 0
    assert (out / "model.xml").exists() and (out / "model.bin").exists()
    v2 = convert_detector_openvino_variant(
        str(out / "model.xml"), str(out / "model.bin"), "yolov5nu"
    )
    assert v2 is not None


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


def test_emitted_shufflenet_ir_runs_like_flax_model(tmp_path):
    """No classifier IR survives upstream, so validation is forward
    parity: the emitted IR (GroupConvolution depthwise branches,
    VariadicSplit halves, the 5-D Reshape/Transpose/Reshape channel
    shuffle, ReduceMean, MatMul fc) through run_ir_graph equals the Flax
    model's logits."""
    import jax.numpy as jnp

    from litepi_tpu.weights.ncnn_export import shufflenetv2_fused_state_dict
    from litepi_tpu.weights.openvino_export import build_classifier_ir
    from litepi_tpu.weights.openvino_import import run_ir_graph

    model, variables = _shufflenet_vars(7)
    sd = shufflenetv2_fused_state_dict(variables)
    xml_data, bin_data = build_classifier_ir("shufflenetv2", sd, 7)
    xml_p = tmp_path / "clf.xml"
    xml_p.write_bytes(xml_data)

    rng = np.random.RandomState(13)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    out_graph = run_ir_graph(str(xml_p), bin_data, img)[0]

    ours = np.asarray(
        model.apply(
            variables, jnp.asarray(img[0].transpose(1, 2, 0))[None],
            train=False,
        )
    )[0]
    assert out_graph.shape == ours.shape == (7,)
    np.testing.assert_allclose(out_graph, ours, atol=1e-4)


def test_classifier_ir_export_reingest_roundtrip(tmp_path):
    """emit -> convert_classifier_openvino_fused -> ShuffleNetV2(fused=
    True) forward equals the source model's."""
    import jax.numpy as jnp

    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.openvino_export import export_classifier_openvino
    from litepi_tpu.weights.openvino_import import (
        convert_classifier_openvino_fused,
    )

    model, variables = _shufflenet_vars(9, seed=3)
    xml_p = tmp_path / "clf.xml"
    export_classifier_openvino("shufflenetv2", variables, 9, str(xml_p))
    fused_vars, ncls = convert_classifier_openvino_fused(
        str(xml_p), str(tmp_path / "clf.bin")
    )
    assert ncls == 9
    fused_model = build_classifier("shufflenetv2", 9, fused=True)
    x = jnp.asarray(
        np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    )
    o1 = np.asarray(model.apply(variables, x, train=False))
    o2 = np.asarray(fused_model.apply(fused_vars, x, train=False))
    np.testing.assert_allclose(o2, o1, atol=1e-4)


def test_convert_cli_emit_openvino_classifier(tmp_path):
    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.weights.checkpoint import save_checkpoint
    from litepi_tpu.weights.openvino_import import (
        convert_classifier_openvino_fused,
    )

    _, variables = _shufflenet_vars(5, seed=1)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), variables)
    out = tmp_path / "export"
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "5",
            "--input", str(ckpt), "--output", str(out),
            "--emit", "openvino",
        ]
    )
    assert rc == 0
    _, ncls = convert_classifier_openvino_fused(
        str(out / "model.xml"), str(out / "model.bin")
    )
    assert ncls == 5
    # other classifier archs keep the pointed rejection
    rc = convert_main(
        [
            "--arch", "resnet18", "--num_classes", "5",
            "--input", str(ckpt), "--output", str(out),
            "--emit", "openvino",
        ]
    )
    assert rc == 2


def test_classifier_ir_converter_rejects_detector_ir(tmp_path):
    from tests.test_ncnn_export import _flax_fused_sd

    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.weights.openvino_export import build_detector_ir
    from litepi_tpu.weights.openvino_import import (
        convert_classifier_openvino_fused,
    )

    sd, _ = _flax_fused_sd(YOLO_PLUS_V2)
    xml_data, bin_data = build_detector_ir(YOLO_PLUS_V2, sd)
    xml_p = tmp_path / "det.xml"
    xml_p.write_bytes(xml_data)
    bin_p = tmp_path / "det.bin"
    bin_p.write_bytes(bin_data)
    with pytest.raises(ValueError, match="ShuffleNetV2"):
        convert_classifier_openvino_fused(str(xml_p), str(bin_p))


def test_convert_cli_ingests_classifier_xml(tmp_path):
    """convert CLI closes the loop the other way: an emitted classifier
    IR converts to an orbax checkpoint (deploy-form), smoke-tested
    through the fused module; wrong --num_classes is a pointed error."""
    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.weights.openvino_export import export_classifier_openvino

    _, variables = _shufflenet_vars(4, seed=5)
    xml_p = tmp_path / "clf.xml"
    export_classifier_openvino("shufflenetv2", variables, 4, str(xml_p))
    out = tmp_path / "ckpt"
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "4",
            "--input", str(xml_p), "--output", str(out),
        ]
    )
    assert rc == 0
    rc = convert_main(
        [
            "--arch", "shufflenetv2", "--num_classes", "9",
            "--input", str(xml_p), "--output", str(out),
        ]
    )
    assert rc == 2
