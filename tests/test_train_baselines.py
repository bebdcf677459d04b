"""Faster-RCNN / SSD300 baseline training CLI: loss falls on a tiny
synthetic dataset, checkpoints are written, and the saved weights load
into the detector benchmark (the reference's train-other-model ->
eval-other-model flow, train-other-model-tsd-tt100k.ipynb cells 11/13 ->
eval cells 24-25)."""

import os
import re

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def det_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("det")
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 120, (120, 160, 3), dtype=np.uint8)
        cv2.rectangle(img, (60, 40), (100, 80), (250, 250, 250), -1)
        cv2.imwrite(str(root / "images" / f"im{i}.jpg"), img)
        (root / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.25 0.33\n")
    return root


def _epoch_losses(captured: str):
    return [float(m) for m in re.findall(r"loss (\d+\.\d+)", captured)]


def test_train_faster_rcnn_cli(det_data, tmp_path, capsys):
    from litepi_tpu.apps.train_baselines import main

    out = str(tmp_path / "frcnn")
    rc = main(
        [
            "--arch", "faster_rcnn",
            "--images", str(det_data / "images"),
            "--labels", str(det_data / "labels"),
            "--imgsz", "128", "--epochs", "3", "--batch", "2",
            "--steps_per_epoch", "3", "--max_gt", "8",
            "--pre_nms_topk", "64", "--post_nms_topk", "16",
            "--output", out, "--device", "cpu",
        ]
    )
    assert rc == 0
    losses = _epoch_losses(capsys.readouterr().out)
    assert len(losses) == 3
    assert losses[-1] < losses[0], losses
    assert os.path.isdir(os.path.join(out, "best"))
    assert os.path.isdir(os.path.join(out, "last"))

    # the checkpoint loads into the bench and emits the CSV-analog row
    # (detect_eval_results_fps_rcnn_ssd.csv fields)
    from litepi_tpu.bench.detector_bench import evaluate_detector
    from litepi_tpu.weights.checkpoint import load_checkpoint

    det_vars = load_checkpoint(os.path.join(out, "best"))
    assert "params" in det_vars and "batch_stats" in det_vars
    row = evaluate_detector(
        "faster_rcnn",
        str(det_data / "images"),
        str(det_data / "labels"),
        det_vars=det_vars,
        num_classes=1,
        input_size=128,
        max_images=2,
    )
    for k in ("model", "num_images", "mAP50", "mAP50_95", "precision", "recall"):
        assert k in row
    assert row["num_images"] == 2


def test_train_ssd300_cli(det_data, tmp_path, capsys):
    from litepi_tpu.apps.train_baselines import main

    out = str(tmp_path / "ssd")
    rc = main(
        [
            "--arch", "ssd300",
            "--images", str(det_data / "images"),
            "--labels", str(det_data / "labels"),
            "--epochs", "2", "--batch", "2",
            "--steps_per_epoch", "2", "--max_gt", "8",
            "--output", out, "--device", "cpu",
        ]
    )
    assert rc == 0
    losses = _epoch_losses(capsys.readouterr().out)
    assert len(losses) == 2
    assert losses[-1] < losses[0], losses
    assert os.path.isdir(os.path.join(out, "last"))

    from litepi_tpu.bench.detector_bench import evaluate_detector
    from litepi_tpu.weights.checkpoint import load_checkpoint

    det_vars = load_checkpoint(os.path.join(out, "best"))
    row = evaluate_detector(
        "ssd300",
        str(det_data / "images"),
        str(det_data / "labels"),
        det_vars=det_vars,
        num_classes=1,
        max_images=2,
    )
    assert row["model"] == "ssd300"
    assert row["num_images"] == 2


def test_ssd_rejects_non_300_imgsz(det_data, tmp_path):
    from litepi_tpu.apps.train_baselines import main

    rc = main(
        [
            "--arch", "ssd300",
            "--images", str(det_data / "images"),
            "--labels", str(det_data / "labels"),
            "--imgsz", "320",
            "--output", str(tmp_path / "x"), "--device", "cpu",
        ]
    )
    assert rc == 2
