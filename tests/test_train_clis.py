"""Training CLIs end-to-end on CPU with tiny synthetic datasets:
checkpoints written, early stopping wiring, val metrics."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def det_data(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("det")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(4):
            img = rng.integers(0, 120, (120, 160, 3), dtype=np.uint8)
            cv2.rectangle(img, (60, 40), (100, 80), (250, 250, 250), -1)
            cv2.imwrite(str(root / split / "images" / f"im{i}.jpg"), img)
            (root / split / "labels" / f"im{i}.txt").write_text(
                "0 0.5 0.5 0.25 0.33\n"
            )
    return root


def test_train_detector_cli(det_data, tmp_path):
    from litepi_tpu.apps.train_detector import main

    out = str(tmp_path / "run")
    rc = main(
        [
            "--images", str(det_data / "train" / "images"),
            "--labels", str(det_data / "train" / "labels"),
            "--val_images", str(det_data / "val" / "images"),
            "--val_labels", str(det_data / "val" / "labels"),
            "--imgsz", "128", "--epochs", "2", "--batch", "2",
            "--steps_per_epoch", "2", "--max_gt", "8",
            "--output", out, "--device", "cpu",
        ]
    )
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "best"))
    assert os.path.isdir(os.path.join(out, "last"))
    # the checkpoint restores
    from litepi_tpu.weights.checkpoint import load_checkpoint

    vars_ = load_checkpoint(os.path.join(out, "best"))
    assert "params" in vars_ and "batch_stats" in vars_


def test_train_classifier_cli(tmp_path):
    import cv2

    from litepi_tpu.apps.train_classifier import main

    data = tmp_path / "crops"
    val = tmp_path / "val"
    rng = np.random.default_rng(1)
    for root in (data, val):
        for ci, c in enumerate(["a", "b"]):
            d = root / c
            d.mkdir(parents=True)
            for i in range(6):
                img = np.zeros((32, 32, 3), np.uint8)
                img[:, :, ci] = 200 + rng.integers(0, 50)
                cv2.imwrite(str(d / f"{i}.png"), img)

    out = str(tmp_path / "run")
    rc = main(
        [
            "--data", str(data), "--val_data", str(val),
            "--img_size", "32", "--epochs", "2", "--batch", "4",
            "--steps_per_epoch", "2", "--output", out, "--device", "cpu",
        ]
    )
    assert rc == 0
    assert os.path.isdir(os.path.join(out, "best"))
