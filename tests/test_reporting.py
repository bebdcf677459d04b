"""Reporting: figures + LaTeX + summary from a reference-schema summary CSV."""

import os

import pytest


@pytest.fixture()
def summary_csv(tmp_path):
    p = tmp_path / "comparison_summary.csv"
    p.write_text(
        "model_combination,detector,classifier,num_test_images,"
        "mean_precision,mean_recall,mean_f1,fps,mAP50,mAP50-95\n"
        "yolo_plus_v2+shufflenetv2,yolo_plus_v2,shufflenetv2,0,,,,0.0,0.0,0.0\n"
        "yolo_plus_v2+shufflenetv2,yolo_plus_v2,shufflenetv2,3019,"
        "0.88,0.81,0.84,5046.4,0.8081,0.5958\n"
        "yolo_plus_v2+resnet18,yolo_plus_v2,resnet18,3019,"
        "0.89,0.81,0.84,3200.0,0.8247,0.6113\n"
    )
    return str(p)


def test_analyzer_full_flow(summary_csv, tmp_path):
    from litepi_tpu.bench.reporting import ResultsAnalyzer

    out = str(tmp_path / "figs")
    a = ResultsAnalyzer(summary_csv, out)
    # the empty warmup row (num_test_images=0) is dropped like the reference
    assert len(a.df) == 2

    paths = a.generate_all_figures(
        stage_ms={
            "shufflenetv2": {"detect": 10, "crop": 3, "classify": 4},
            "resnet18": {"detect": 10, "crop": 3, "classify": 9},
        },
        samples_ms={"shufflenetv2": [19, 20, 21, 25], "resnet18": [30, 31, 35]},
        usage={
            "shufflenetv2": {"cpu_percent": 40.0, "memory_mb": 900.0},
            "resnet18": {"cpu_percent": 45.0, "memory_mb": 1100.0},
        },
    )
    assert len(paths) == 5
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0

    tex = open(os.path.join(out, "comparison_table.tex")).read()
    assert "\\begin{tabular}" in tex
    assert "yolo\\_plus\\_v2+shufflenetv2" in tex
    assert "5046.40" in tex or "5046.4" in tex

    report = open(os.path.join(out, "summary_report.txt")).read()
    assert "fastest: yolo_plus_v2+shufflenetv2" in report
    assert "most accurate: yolo_plus_v2+resnet18" in report
