"""Integration test: the e2e CLI over a synthetic YOLO-format dataset,
checking the reference-compatible output artifacts (comparison_summary.csv
append schema, per-combo results CSV, test-files manifest)."""

import csv
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("data")
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        img = rng.integers(0, 100, (200, 320, 3), dtype=np.uint8)
        # a bright "sign" rectangle
        x, y = 40 + 30 * i % 150, 50
        cv2.rectangle(img, (x, y), (x + 40, y + 40), (255, 255, 255), -1)
        cv2.imwrite(str(img_dir / f"img{i}.jpg"), img)
        cx, cy, w, h = (x + 20) / 320, (y + 20) / 200, 40 / 320, 40 / 200
        (lbl_dir / f"img{i}.txt").write_text(f"{i % 3} {cx} {cy} {w} {h}\n")
    return img_dir, lbl_dir


@pytest.mark.slow
def test_cli_end_to_end(synth_dataset, tmp_path):
    from litepi_tpu.apps.e2e import main

    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "output_eval"
    rc = main(
        [
            "--input", str(img_dir),
            "--labels", str(lbl_dir),
            "--num_classes", "3",
            "--det_input_size", "160",
            "--batch_size", "2",
            "--max_det", "8",
            "--max_candidates", "64",
            "--num_samples", "4",
            "--output", str(out),
            "--device", "cpu",
            "--save_viz",
        ]
    )
    assert rc == 0
    viz = out / "yolo_plus_v2+shufflenetv2" / "viz"
    assert viz.exists() and len(list(viz.iterdir())) == 4

    summary = out / "comparison_summary.csv"
    assert summary.exists()
    rows = list(csv.reader(open(summary)))
    assert rows[0] == [
        "model_combination", "detector", "classifier", "num_test_images",
        "mean_precision", "mean_recall", "mean_f1", "fps", "mAP50", "mAP50-95",
    ]
    assert rows[1][0] == "yolo_plus_v2+shufflenetv2"
    assert int(rows[1][3]) == 4
    assert float(rows[1][7]) > 0  # fps

    combo = out / "yolo_plus_v2+shufflenetv2"
    results = combo / "yolo_plus_v2+shufflenetv2_results.csv"
    manifest = combo / "yolo_plus_v2+shufflenetv2_test_files.txt"
    assert results.exists() and manifest.exists()
    assert len(manifest.read_text().splitlines()) == 4

    # appending a second run grows the summary without rewriting the header
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--num_classes", "3", "--det_input_size", "160",
            "--batch_size", "2", "--max_det", "8", "--max_candidates", "64",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--clf_arch", "resnet18",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(summary)))
    assert len(rows) == 3
    assert rows[2][0] == "yolo_plus_v2+resnet18"

    # host-counter + stage side CSVs for the reporting CLI
    usage = combo / "yolo_plus_v2+shufflenetv2_usage.csv"
    assert usage.exists()
    assert "cpu_percent" in usage.read_text()

    # report CLI over the eval output: all figures incl resource utilisation
    from litepi_tpu.apps.report import main as report_main

    figs = tmp_path / "figs"
    rc = report_main(["--input", str(out), "--output", str(figs)])
    assert rc == 0
    assert (figs / "resource_utilization.png").exists()
    assert (figs / "latency_breakdown.png").exists()
    assert (figs / "summary_report.txt").exists()


def test_cli_vntsr_preset(synth_dataset, tmp_path):
    """--dataset vntsr resolves the VN-Signs tree's shipped configuration:
    yolo_plus_v1 detector, 49 crop classes, per-channel crop stats
    (train-model-tsr-vntsr.ipynb cell 4)."""
    from litepi_tpu.apps.e2e import main

    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "out_vn"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--dataset", "vntsr", "--det_input_size", "160",
            "--batch_size", "2", "--max_det", "8", "--max_candidates", "64",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0] == "yolo_plus_v1+shufflenetv2"


def test_cli_yolov5n_variant(synth_dataset, tmp_path):
    """The anchor-based v5n baseline runs end-to-end through the same CLI
    (reference README.md:39 v5 row)."""
    from litepi_tpu.apps.e2e import main

    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "out_v5"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--num_classes", "3", "--det_input_size", "160",
            "--batch_size", "2", "--max_det", "8", "--max_candidates", "64",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--detector_variant", "yolov5n",
        ]
    )
    assert rc == 0
    import csv

    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0] == "yolov5n+shufflenetv2"


def test_cli_ncnn_artifact_errors(synth_dataset, tmp_path, capsys):
    """Missing / unpaired NCNN artifacts fail with a pointed message, not a
    traceback."""
    from litepi_tpu.apps.e2e import main

    img_dir, lbl_dir = synth_dataset
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector_param", "no_such.ncnn.param",
            "--detector_bin", "no_such.ncnn.bin",
        ]
    )
    assert rc == 2
    # .param without .bin is unusable (weights live in the .bin)
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector_param", "no_such.ncnn.param",
        ]
    )
    assert rc == 2
    # a VALID .param with a missing .bin: the early probe parses the
    # .param fine, so the miss surfaces at weight-read time — still a
    # pointed rc=2, not a traceback (self-review regression)
    if os.path.isdir(REF_V1):
        rc = main(
            [
                "--input", str(img_dir), "--labels", str(lbl_dir),
                "--detector_param",
                f"{REF_V1}/yolo_plus_ncnn_model/model.ncnn.param",
                "--detector_bin", "no_such.ncnn.bin",
            ]
        )
        assert rc == 2
        err = capsys.readouterr().err
        assert "no_such.ncnn.bin" in err and "Traceback" not in err


REF_V1 = "/root/reference/src/vntsr/convert/model/yolo_plus"


@pytest.mark.skipif(
    not os.path.isdir(REF_V1), reason="reference checkout not present"
)
@pytest.mark.slow
def test_cli_loads_real_ncnn_pair(synth_dataset, tmp_path):
    """The reference CLI's own flags drive the pipeline with the REAL
    shipped v1 NCNN pair (reference: e2e.py:195-220); the variant is
    inferred from the graph, no --detector_variant needed."""
    import csv

    from litepi_tpu.apps.e2e import main

    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "out"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector_param", f"{REF_V1}/yolo_plus_ncnn_model/model.ncnn.param",
            "--detector_bin", f"{REF_V1}/yolo_plus_ncnn_model/model.ncnn.bin",
            "--dataset", "vntsr", "--det_input_size", "160",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--warmup", "0", "--batch_size", "2", "--max_det", "8",
            "--eval_max_candidates", "64", "--eval_max_det", "16",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0].startswith("yolo_plus_v1+")


@pytest.mark.skipif(
    not os.path.isdir(REF_V1), reason="reference checkout not present"
)
def test_cli_variant_conflict_with_artifact(synth_dataset):
    from litepi_tpu.apps.e2e import main

    img_dir, lbl_dir = synth_dataset
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector_param", f"{REF_V1}/yolo_plus_ncnn_model/model.ncnn.param",
            "--detector_bin", f"{REF_V1}/yolo_plus_ncnn_model/model.ncnn.bin",
            "--detector_variant", "yolo_plus_v2",
        ]
    )
    assert rc == 2


@pytest.mark.skipif(
    not os.path.isdir(REF_V1), reason="reference checkout not present"
)
@pytest.mark.slow
def test_cli_loads_variant_ncnn_param(synth_dataset, tmp_path):
    """--detector_param with a v5u graph: variant inferred from topology,
    weights ingested directly (synthetic .bin — the real one is stripped
    upstream)."""
    import csv

    from test_ncnn_import import V5_PARAM, _synth_variant_bin

    from litepi_tpu.apps.e2e import main
    from litepi_tpu.weights.ncnn_import import parse_ncnn_param

    bin_path = tmp_path / "v5.bin"
    bin_path.write_bytes(_synth_variant_bin(parse_ncnn_param(V5_PARAM)))
    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "out"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector_param", V5_PARAM,
            "--detector_bin", str(bin_path),
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--warmup", "0", "--batch_size", "2", "--max_det", "8",
            "--eval_max_candidates", "64", "--eval_max_det", "16",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0].startswith("yolov5n+")


REF_V8 = "/root/reference/src/tt100k/convert/model/yolo8"
REF_V5_OV = (
    "/root/reference/src/tt100k/convert/model/yolo5/yolo5_openvino_model"
)


@pytest.mark.skipif(
    not os.path.isdir(REF_V8), reason="reference checkout not present"
)
@pytest.mark.slow
def test_cli_loads_yolov8n_ncnn_pair(synth_dataset, tmp_path):
    """--detector_param with the stock-v8n deployed graph: the topology
    probe recognises all four shipped NCNN families, not just yolo_plus
    (synthetic .bin — the real one is stripped upstream)."""
    import csv

    from test_ncnn_import import _synth_variant_bin

    from litepi_tpu.apps.e2e import main
    from litepi_tpu.weights.ncnn_import import parse_ncnn_param

    param = f"{REF_V8}/yolo8_ncnn_model/model.ncnn.param"
    bin_path = tmp_path / "v8.bin"
    bin_path.write_bytes(_synth_variant_bin(parse_ncnn_param(param)))
    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "out"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector_param", param,
            "--detector_bin", str(bin_path),
            "--det_input_size", "160",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--warmup", "0", "--batch_size", "2", "--max_det", "8",
            "--eval_max_candidates", "64", "--eval_max_det", "16",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0].startswith("yolov8n+")


@pytest.mark.skipif(
    not os.path.isdir(REF_V5_OV), reason="reference checkout not present"
)
@pytest.mark.slow
def test_cli_loads_variant_openvino_xml(synth_dataset, tmp_path):
    """--detector with a baseline OpenVINO IR: variant inferred from the
    IR topology, weights ingested directly (synthetic blob — the real
    .bin is stripped upstream)."""
    import csv

    from test_ncnn_import import _synth_ir_blob

    from litepi_tpu.apps.e2e import main

    xml = f"{REF_V5_OV}/yolo5.xml"
    blob = tmp_path / "yolo5.bin"
    blob.write_bytes(_synth_ir_blob(xml))
    img_dir, lbl_dir = synth_dataset
    out = tmp_path / "out"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--detector", xml,
            "--detector_bin", str(blob),
            "--det_input_size", "160",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--warmup", "0", "--batch_size", "2", "--max_det", "8",
            "--eval_max_candidates", "64", "--eval_max_det", "16",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0].startswith("yolov5n+")


def test_cli_loads_emitted_classifier_param(synth_dataset, tmp_path):
    """Classifier round trip through the CLI surface: --emit ncnn output
    (shufflenetv2 pair) loads back via --classifier foo.param as
    deploy-form variables."""
    import jax

    from litepi_tpu.apps.e2e import main
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.ncnn_export import export_classifier_ncnn

    img_dir, lbl_dir = synth_dataset
    model = build_classifier("shufflenetv2", 3)
    variables = model.init(
        jax.random.PRNGKey(2), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    param = tmp_path / "clf.param"
    export_classifier_ncnn(
        "shufflenetv2", variables, 3, str(param), str(tmp_path / "clf.bin")
    )
    out = tmp_path / "out"
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--classifier", str(param),
            "--num_classes", "3", "--det_input_size", "160",
            "--num_samples", "2", "--output", str(out), "--device", "cpu",
            "--warmup", "0", "--batch_size", "2", "--max_det", "8",
            "--eval_max_candidates", "64", "--eval_max_det", "16",
        ]
    )
    assert rc == 0
    rows = list(csv.reader(open(out / "comparison_summary.csv")))
    assert rows[1][0].endswith("+shufflenetv2")


def test_cli_classifier_param_class_mismatch(synth_dataset, tmp_path, capsys):
    import jax

    from litepi_tpu.apps.e2e import main
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.ncnn_export import export_classifier_ncnn

    img_dir, lbl_dir = synth_dataset
    model = build_classifier("shufflenetv2", 7)
    variables = model.init(
        jax.random.PRNGKey(2), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    param = tmp_path / "clf.param"
    export_classifier_ncnn(
        "shufflenetv2", variables, 7, str(param), str(tmp_path / "clf.bin")
    )
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--classifier", str(param), "--num_classes", "3",
            "--det_input_size", "160", "--output", str(tmp_path / "o"),
            "--device", "cpu",
        ]
    )
    assert rc == 2
    assert "7 classes" in capsys.readouterr().err


def test_cli_loads_emitted_classifier_onnx_and_xml(synth_dataset, tmp_path):
    """The other two classifier wire formats load through the CLI too:
    --classifier foo.onnx (the reference's interchange form) and foo.xml
    (runner.py:229 BaselineClassifier's OpenVINO form)."""
    import jax

    from litepi_tpu.apps.e2e import main
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.onnx_export import export_classifier_onnx
    from litepi_tpu.weights.openvino_export import export_classifier_openvino

    img_dir, lbl_dir = synth_dataset
    model = build_classifier("shufflenetv2", 3)
    variables = model.init(
        jax.random.PRNGKey(2), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    onnx_p = tmp_path / "clf.onnx"
    export_classifier_onnx("shufflenetv2", variables, 3, str(onnx_p))
    xml_p = tmp_path / "clf.xml"
    export_classifier_openvino("shufflenetv2", variables, 3, str(xml_p))
    common = [
        "--input", str(img_dir), "--labels", str(lbl_dir),
        "--num_classes", "3", "--det_input_size", "160",
        "--num_samples", "2", "--device", "cpu",
        "--warmup", "0", "--batch_size", "2", "--max_det", "8",
        "--eval_max_candidates", "64", "--eval_max_det", "16",
    ]
    for i, clf in enumerate([onnx_p, xml_p]):
        out = tmp_path / f"out{i}"
        rc = main(common + ["--classifier", str(clf), "--output", str(out)])
        assert rc == 0
        rows = list(csv.reader(open(out / "comparison_summary.csv")))
        assert rows[1][0].endswith("+shufflenetv2")


def test_cli_classifier_xml_class_mismatch(synth_dataset, tmp_path, capsys):
    import jax

    from litepi_tpu.apps.e2e import main
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.openvino_export import export_classifier_openvino

    img_dir, lbl_dir = synth_dataset
    model = build_classifier("shufflenetv2", 7)
    variables = model.init(
        jax.random.PRNGKey(2), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    xml_p = tmp_path / "clf.xml"
    export_classifier_openvino("shufflenetv2", variables, 7, str(xml_p))
    rc = main(
        [
            "--input", str(img_dir), "--labels", str(lbl_dir),
            "--classifier", str(xml_p),
            "--num_classes", "3", "--det_input_size", "160",
            "--num_samples", "1", "--output", str(tmp_path / "o"),
            "--device", "cpu",
        ]
    )
    assert rc == 2
    assert "7 classes" in capsys.readouterr().err
