"""Optimization-ladder experiment: structure + report generation on CPU with
tiny shapes (full-size runs happen on hardware via the CLI)."""

import dataclasses

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


def test_ladder_runs_and_reports():
    exp = OptimizationExperiment(TINY_CFG, frame_hw=(128, 128), levels=TINY_LEVELS)
    results = exp.run_all_levels(warmup=1, iterations=2)
    assert set(results) == {"Level 0", "Level 3"}
    for s in results.values():
        assert s["fps"] > 0 and s["p95"] >= s["p50"]

    report = exp.generate_comparison_report()
    lines = report.splitlines()
    assert lines[0].startswith("level,description")
    assert len(lines) == 3
    assert "speedup_vs_L0" in lines[0]

    tex = exp.generate_latex()
    assert "\\begin{tabular}" in tex and "Level 3" in tex


def test_pipeline_cache_shared_across_levels():
    exp = OptimizationExperiment(TINY_CFG, frame_hw=(128, 128), levels=TINY_LEVELS)
    a = exp._get_pipeline(TINY_LEVELS[1])
    b = exp._get_pipeline(
        dataclasses.replace(TINY_LEVELS[1], batch=99)  # batch not part of key
    )
    assert a is b
