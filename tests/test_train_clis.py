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


@pytest.mark.slow
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


@pytest.mark.slow
def test_train_detector_resume_matches_uninterrupted(det_data, tmp_path):
    """1 epoch + --resume for 2 more == 3 epochs straight through: the
    resume checkpoint carries params, EMA, optimizer moments and the epoch
    cursor, and the dataset RNG is (seed, epoch)-pure."""
    from litepi_tpu.apps.train_detector import main
    from litepi_tpu.weights.checkpoint import load_checkpoint

    common = [
        "--images", str(det_data / "train" / "images"),
        "--labels", str(det_data / "train" / "labels"),
        "--imgsz", "128", "--batch", "2", "--steps_per_epoch", "2",
        "--max_gt", "8", "--device", "cpu", "--patience", "99",
    ]
    straight = str(tmp_path / "straight")
    assert main(common + ["--epochs", "3", "--output", straight]) == 0

    # same total --epochs both times (the lr schedule spans it); --stop_after
    # simulates the preemption
    resumed = str(tmp_path / "resumed")
    assert main(
        common + ["--epochs", "3", "--stop_after", "1", "--output", resumed]
    ) == 0
    assert os.path.isdir(os.path.join(resumed, "resume"))
    assert main(
        common + ["--epochs", "3", "--output", resumed, "--resume"]
    ) == 0

    a = load_checkpoint(os.path.join(straight, "last"))
    b = load_checkpoint(os.path.join(resumed, "last"))
    flat_a = jax_flatten(a)
    flat_b = jax_flatten(b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            flat_a[k], flat_b[k], rtol=1e-6, atol=1e-6, err_msg=k
        )


def jax_flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


@pytest.mark.slow
def test_train_classifier_resume_cursor(tmp_path):
    """Classifier --resume restores the epoch cursor and full state."""
    import cv2

    from litepi_tpu.apps.train_classifier import main

    data = tmp_path / "crops"
    rng = np.random.default_rng(1)
    for ci, c in enumerate(["a", "b"]):
        d = data / c
        d.mkdir(parents=True)
        for i in range(6):
            img = np.zeros((32, 32, 3), np.uint8)
            img[:, :, ci] = 200 + rng.integers(0, 50)
            cv2.imwrite(str(d / f"{i}.png"), img)

    out = str(tmp_path / "run")
    common = [
        "--data", str(data), "--img_size", "32", "--batch", "4",
        "--steps_per_epoch", "2", "--output", out, "--device", "cpu",
        "--patience", "99",
    ]
    assert main(common + ["--epochs", "1"]) == 0
    assert os.path.isdir(os.path.join(out, "resume"))
    assert main(common + ["--epochs", "2", "--resume"]) == 0


@pytest.mark.slow
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
