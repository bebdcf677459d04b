"""Optimization-ladder experiment: structure + report generation on CPU with
tiny shapes (full-size runs happen on hardware via the CLI)."""

import dataclasses

import pytest

import numpy as np

from litepi_tpu.bench.ladder import LevelSpec, OptimizationExperiment
from litepi_tpu.core.types import DetectorConfig, NMSConfig, PipelineConfig

TINY_CFG = PipelineConfig(
    detector=DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=128
    ),
    nms=NMSConfig(max_candidates=64, max_detections=8),
    num_classifier_classes=4,
    det_input_size=128,
)

TINY_LEVELS = [
    LevelSpec("Level 0", "staged batch 1 f32", 1, False, "float32", max_detections=8),
    LevelSpec("Level 3", "fused batch 2", 2, True, max_detections=8),
]


@pytest.mark.slow
def test_ladder_runs_and_reports():
    exp = OptimizationExperiment(TINY_CFG, levels=TINY_LEVELS)
    exp.use_synthetic_dataset(n=4)
    results = exp.run_all_levels(warmup=1, iterations=2)
    assert set(results) == {"Level 0", "Level 3"}
    for s in results.values():
        assert s["fps"] > 0 and s["p95"] >= s["p50"]
        # every level carries an accuracy figure alongside latency
        assert 0.0 <= s["mAP50"] <= 1.0
        assert "precision" in s and "recall" in s

    report = exp.generate_comparison_report()
    lines = report.splitlines()
    assert lines[0].startswith("level,description")
    assert len(lines) == 3
    assert "speedup_vs_L0" in lines[0] and "mAP50" in lines[0]

    tex = exp.generate_latex()
    assert "\\begin{tabular}" in tex and "Level 3" in tex and "mAP50" in tex


def test_ladder_loads_folder_dataset(tmp_path):
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
    exp = OptimizationExperiment(TINY_CFG, levels=TINY_LEVELS[:1])
    n = exp.load_test_dataset(str(img_dir), str(lbl_dir))
    assert n == 3
    s = exp.run_single_level(TINY_LEVELS[0], warmup=0, iterations=1)
    assert s["fps"] > 0 and 0.0 <= s["mAP50"] <= 1.0


def test_pipeline_cache_shared_across_levels():
    exp = OptimizationExperiment(TINY_CFG, levels=TINY_LEVELS)
    a = exp._get_pipeline(TINY_LEVELS[1])
    b = exp._get_pipeline(
        dataclasses.replace(TINY_LEVELS[1], batch=99)  # batch not part of key
    )
    assert a is b


def test_plot_optimization_progress(tmp_path):
    from litepi_tpu.bench.ladder import LEVELS, OptimizationExperiment

    exp = OptimizationExperiment(levels=LEVELS[:3])
    for i, spec in enumerate(exp.levels):
        exp.results[spec.name] = {
            "mean": 100.0 / (i + 1), "p50": 90.0, "p95": 110.0, "p99": 120.0,
            "fps": 10.0 * (i + 1), "batch": spec.batch,
            "mAP50": 0.5, "precision": 0.6, "recall": 0.4,
        }
    out = exp.plot_optimization_progress(str(tmp_path / "prog.png"))
    import os
    assert out is None or (os.path.exists(out) and os.path.getsize(out) > 0)
