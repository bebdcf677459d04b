"""Detector fair-benchmark + classifier eval modules on CPU (tiny shapes)."""

import numpy as np
import pytest

from litepi_tpu.bench.classifier_bench import (
    confusion_analysis,
    count_params,
    evaluate_classifier,
    macro_prf1,
    model_size_mb,
    predict_topk,
)
from litepi_tpu.bench.detector_bench import (
    benchmark_detector,
    evaluate_detector,
    make_harness,
)


@pytest.mark.slow
def test_detector_bench_row_schema():
    row = benchmark_detector(
        "yolo_plus_v1", batch=1, warmup=1, iters=2, input_size=128,
        dtype="float32",
    )
    assert row["model"] == "yolo_plus_v1" and row["backend"] == "xla"
    for k in ("pre_ms", "infer_ms", "post_ms", "total_ms", "fps"):
        assert row[k] >= 0
    assert row["total_ms"] == pytest.approx(
        row["pre_ms"] + row["infer_ms"] + row["post_ms"], abs=0.01
    )


@pytest.mark.parametrize(
    "variant,size", [("yolov5n", 128), ("yolov11n", 128), ("faster_rcnn", 128)]
)
@pytest.mark.slow
def test_detector_bench_other_families(variant, size):
    """The v5 anchor-based and two-stage baselines run through the same
    fair-benchmark protocol (reference: detect_eval_results_fps_rcnn_ssd.csv
    rows + v5 row of detect_eval_results_fps_v5_8_11_custom.csv)."""
    row = benchmark_detector(
        variant, batch=1, warmup=0, iters=1, input_size=size, dtype="float32"
    )
    assert row["model"] == variant and row["fps"] > 0


@pytest.mark.slow
def test_detector_bench_ssd300():
    row = benchmark_detector(
        "ssd300", batch=1, warmup=0, iters=1, dtype="float32"
    )
    assert row["model"] == "ssd300" and row["fps"] > 0


def test_evaluate_detector_on_labelled_folder(tmp_path):
    """RCNN/SSD-style mAP harness: any variant's decode wired through the
    reference-exact evaluator on a YOLO-format folder."""
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"i{i}.jpg"), img)
        (lbl_dir / f"i{i}.txt").write_text("0 0.5 0.5 0.25 0.25\n")

    rep = evaluate_detector(
        "yolo_plus_v1", str(img_dir), str(lbl_dir), input_size=128,
        max_images=3,
    )
    assert rep["num_images"] == 3
    assert 0.0 <= rep["mAP50"] <= 1.0
    for k in ("mAP50_95", "precision", "recall"):
        assert k in rep


def test_harness_unmap_geometries():
    h_lb = make_harness("yolo_plus_v1", input_size=128, dtype="float32")
    h_rs = make_harness("faster_rcnn", input_size=128, dtype="float32")
    box = np.array([[10.0, 20.0, 50.0, 60.0]])
    # letterbox of a 256x128 original into 128: r=0.5, dw=0, dh=32
    out = h_lb.unmap_boxes(box.copy(), 256, 128)
    np.testing.assert_allclose(out[0], [20.0, 0.0, 100.0, 56.0], atol=0.51)
    # plain resize of a 256x512 original: sx=2, sy=4
    out = h_rs.unmap_boxes(box.copy(), 256, 512)
    np.testing.assert_allclose(out[0], [20.0, 80.0, 100.0, 240.0], atol=1e-5)


def test_macro_prf1_perfect():
    labels = np.array([0, 1, 2, 0])
    p, r, f1 = macro_prf1(labels.copy(), labels, 3)
    assert p == pytest.approx(1.0, abs=1e-6)
    assert r == pytest.approx(1.0, abs=1e-6)
    assert f1 == pytest.approx(1.0, abs=1e-6)


def test_macro_prf1_skips_absent_classes():
    labels = np.array([0, 0])
    preds = np.array([0, 1])
    p, r, _ = macro_prf1(preds, labels, 5)
    assert r == pytest.approx(0.5, abs=1e-6)  # only class 0 counted


def test_confusion_analysis():
    """evaluation-tsr cell 14 semantics: top confused pairs by count,
    per-class accuracy over classes present in the labels only."""
    labels = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
    preds = np.array([0, 2, 2, 1, 0, 2, 2, 2, 1])
    rep = confusion_analysis(preds, labels, num_classes=4, top=2)
    assert rep["confusion_matrix"][0, 2] == 2
    assert rep["most_confused"][0] == {"true": "0", "pred": "2", "count": 2}
    assert len(rep["most_confused"]) == 2
    assert rep["per_class_accuracy"]["2"] == pytest.approx(0.75)
    assert "3" not in rep["per_class_accuracy"]  # absent class skipped
    assert rep["worst_classes"][0][0] == "0"  # 1/3 correct is worst


def test_confusion_analysis_perfect_has_no_pairs():
    labels = np.array([0, 1, 2])
    rep = confusion_analysis(labels.copy(), labels, num_classes=3)
    assert rep["most_confused"] == []
    assert all(v == 1.0 for v in rep["per_class_accuracy"].values())


@pytest.fixture(scope="module")
def trained_like_classifier():
    import jax.numpy as jnp

    from litepi_tpu.models import build_classifier
    from litepi_tpu.models.init_utils import fast_init

    model = build_classifier("shufflenetv2", 4)
    return fast_init(model, seed=0, spatial=32)


def test_evaluate_classifier_report(trained_like_classifier):
    rng = np.random.default_rng(0)
    images = rng.normal(size=(20, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 20)
    rep = evaluate_classifier(
        "shufflenetv2", trained_like_classifier, images, labels, 4,
        batch=8, warmup=1, timed_iters=2,
    )
    assert 0.0 <= rep["accuracy"] <= 1.0
    assert rep["params"] > 1e5
    assert rep["size_mb"] > 0
    assert rep["fps"] > 0
    assert rep["params"] == count_params(trained_like_classifier)
    assert rep["size_mb"] == pytest.approx(
        model_size_mb(trained_like_classifier), abs=0.01
    )


def test_predict_topk(trained_like_classifier):
    rng = np.random.default_rng(1)
    img = rng.normal(size=(32, 32, 3)).astype(np.float32)
    top = predict_topk(
        "shufflenetv2", trained_like_classifier, img, 4, k=3,
        class_names={0: "stop"},
    )
    assert len(top) == 3
    assert top[0]["prob"] >= top[1]["prob"] >= top[2]["prob"]
    probs = [t["prob"] for t in top]
    assert all(0 <= q <= 1 for q in probs)
