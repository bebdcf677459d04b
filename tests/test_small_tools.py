"""Ablation configs, data-split tool, convert CLI and run.bash presence."""

import os
import subprocess

import numpy as np
import pytest

from litepi_tpu.core.types import YOLO_PLUS_V2, ablation_configs


def test_ablation_grid():
    cfgs = ablation_configs()
    names = [c.name for c in cfgs]
    assert names == [
        "ablation_w0.5_d0.33",
        "ablation_w0.75_d0.33",
        "ablation_w1_d0.33",
        "ablation_w0.75_d0.67",
    ]
    by_name = {c.name: c for c in cfgs}
    # w0.75/d0.33 IS the shipped yolo_plus_v2 (the "YOLO-LitePi" point)
    litepi = by_name["ablation_w0.75_d0.33"]
    assert litepi.channels == YOLO_PLUS_V2.channels
    assert litepi.depths == YOLO_PLUS_V2.depths
    # depth 0.67 doubles the deep-stage repeats
    assert by_name["ablation_w0.75_d0.67"].depths == (2, 4, 4, 2)
    # width ordering is monotone
    assert (
        by_name["ablation_w0.5_d0.33"].channels
        < by_name["ablation_w0.75_d0.33"].channels
        < by_name["ablation_w1_d0.33"].channels
    )


def test_data_split(tmp_path):
    from litepi_tpu.apps.data_split import build_subset

    src_i = tmp_path / "si"
    src_l = tmp_path / "sl"
    src_i.mkdir()
    src_l.mkdir()
    for i in range(5):
        (src_i / f"im{i}.jpg").write_bytes(b"x")
    (src_l / "im0.txt").write_text("0 0.5 0.5 0.1 0.1\n")  # only im0 labelled
    n = build_subset(
        str(src_i), str(src_l), str(tmp_path / "di"), str(tmp_path / "dl"), 3
    )
    assert n == 3
    assert sorted(os.listdir(tmp_path / "di")) == ["im0.jpg", "im1.jpg", "im2.jpg"]
    # negatives get EMPTY label files (the reference's convention)
    assert (tmp_path / "dl" / "im1.txt").read_text() == ""
    assert (tmp_path / "dl" / "im0.txt").read_text().startswith("0 ")


def test_convert_cli_roundtrip(tmp_path):
    import torch

    from litepi_tpu.apps.convert import main
    from tests.torch_refs import ShuffleNetV2T

    torch.manual_seed(0)
    tm = ShuffleNetV2T(num_classes=7)
    pth = str(tmp_path / "m.pth")
    torch.save(tm.state_dict(), pth)

    out = str(tmp_path / "ckpt")
    rc = main(
        ["--arch", "shufflenetv2", "--num_classes", "7",
         "--input", pth, "--output", out]
    )
    assert rc == 0

    # restored checkpoint matches the direct conversion numerically
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.checkpoint import load_checkpoint
    from litepi_tpu.weights.torch_import import convert_classifier_state_dict

    restored = load_checkpoint(out)
    direct = convert_classifier_state_dict(
        "shufflenetv2", {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    model = build_classifier("shufflenetv2", 7)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(restored, x, train=False)),
        np.asarray(model.apply(direct, x, train=False)),
        atol=1e-6,
    )


def test_run_bash_exists_and_parses():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "run.bash")
    assert os.path.exists(path)
    subprocess.run(["bash", "-n", path], check=True)


def test_write_results_emits_metrics_png(tmp_path):
    from litepi_tpu.pipeline.evaluator import write_results

    metrics = {
        "num_images": 3,
        "precision": 0.9,
        "recall": 0.8,
        "f1": 0.85,
        "fps": 100.0,
        "mAP50": 0.8,
        "mAP50_95": 0.6,
        "per_class": {
            0: {"precision": 1.0, "recall": 0.9, "f1": 0.95, "tp": 9, "fp": 0, "fn": 1}
        },
    }
    write_results(
        str(tmp_path), "combo", "det", "clf", metrics, ["a.jpg"], {0: "stop"}
    )
    assert (tmp_path / "combo" / "combo_metrics.png").exists()
    assert (tmp_path / "comparison_summary.csv").exists()
