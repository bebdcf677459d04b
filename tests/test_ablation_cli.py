"""Ablation-runner CLI (revision-ablation-study.ipynb as a tool)."""

import csv
import os

import numpy as np
import pytest


def test_ablation_static_mode(tmp_path):
    """Static sweep: params + GFLOPs per variant; the w0.75/d0.33 row must
    reproduce the shipped yolo_plus_v2's published 1.8M params
    (README.md:14) — the scales are actually applied, unlike the
    reference's run (SURVEY §6 footnote)."""
    from litepi_tpu.apps.ablation import main

    out = str(tmp_path / "abl")
    rc = main(
        [
            "--widths", "0.5,0.75", "--depths", "0.33", "--extra", "",
            "--imgsz", "64", "--output", out,
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "ablation_results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert [r["name"] for r in rows] == [
        "ablation_w0.5_d0.33", "ablation_w0.75_d0.33"
    ]
    params = {r["name"]: int(r["params"]) for r in rows}
    assert 1_700_000 < params["ablation_w0.75_d0.33"] < 1_900_000
    assert params["ablation_w0.5_d0.33"] < params["ablation_w0.75_d0.33"]
    assert all(float(r["gflops"]) > 0 for r in rows)


def test_ablation_extra_combo_and_errors(tmp_path):
    from litepi_tpu.apps.ablation import main

    rc = main(["--widths", "nope", "--output", str(tmp_path / "x")])
    assert rc == 2
    rc = main(["--train", "--output", str(tmp_path / "y")])
    assert rc == 2


@pytest.mark.slow
def test_ablation_train_mode(tmp_path):
    """--train loops train_detector per variant (tiny run) and harvests
    results.json into the CSV's map50 column."""
    import cv2

    from litepi_tpu.apps.ablation import main

    root = tmp_path / "data"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 120, (120, 160, 3), dtype=np.uint8)
        cv2.rectangle(img, (60, 40), (100, 80), (250, 250, 250), -1)
        cv2.imwrite(str(root / "images" / f"im{i}.jpg"), img)
        (root / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.25 0.33\n")

    out = str(tmp_path / "abl")
    rc = main(
        [
            "--widths", "0.5", "--depths", "0.33", "--extra", "",
            "--imgsz", "64", "--output", out, "--train",
            "--images", str(root / "images"),
            "--labels", str(root / "labels"),
            "--epochs", "1",
            "--train_args",
            "--device cpu --batch 2 --steps_per_epoch 2 --max_gt 8 "
            "--imgsz 128",
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "ablation_results.csv")) as f:
        (row,) = list(csv.DictReader(f))
    assert row["map50"] != ""
    assert row["best_epoch"] == "1"
