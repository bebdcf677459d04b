"""Full-lifecycle composition: train -> emit -> re-ingest -> eval
(VERDICT r4 'next #5').

Every arrow here is individually tested elsewhere (training loss falls,
emitters reproduce the shipped graphs bit-exactly, the CLI ingests each
format, the evaluator is differentially pinned); this test composes them
END TO END: a detector trained in this framework, checkpointed to orbax,
emitted to each deployment format by apps/convert.py, re-ingested by the
e2e CLI, must produce metric rows IDENTICAL to the orbax-checkpoint run.
fps (wall-clock) and artifact paths are excluded from the comparison.

Reference analog: the convert_model_detect.ipynb flow (torch -> pnnx/ONNX/
OpenVINO -> e2e.py evaluation over each backend, e2e.py:1013-1189) — the
reference never asserts cross-format metric equality; here it is exact
because every format round-trips through the same f32 weights.
"""

import csv
import functools

import numpy as np
import pytest

S = 160  # train/eval resolution (resolution-independent conv weights)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("lifecycle_data")
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        img = rng.integers(0, 90, (200, 320, 3), dtype=np.uint8)
        # 80 px box: letterboxing 320x200 -> 160 halves it to ~40 canvas px,
        # inside the trained 24-48 px range (a 40 px source box lands at
        # ~20 canvas px, below what the short training recipe detects)
        x, y = 40 + (37 * i) % 150, 30 + (23 * i) % 60
        cv2.rectangle(img, (x, y), (x + 80, y + 80), (255, 255, 255), -1)
        cv2.imwrite(str(img_dir / f"img{i}.jpg"), img)
        cx, cy = (x + 40) / 320, (y + 40) / 200
        (lbl_dir / f"img{i}.txt").write_text(
            f"{i % 3} {cx} {cy} {80 / 320} {80 / 200}\n"
        )
    return img_dir, lbl_dir


def _train_tiny_v2(steps=200):
    """Real training on the FLAGSHIP v2 widths (emission plans exist only
    for the deployed families) at reduced resolution, long enough that the
    detector finds the eval scenes' bright boxes — an all-zero metric row
    would make the cross-format equality check vacuous."""
    import jax
    import jax.numpy as jnp

    from litepi_tpu.core.types import YOLO_PLUS_V2
    import dataclasses

    from litepi_tpu.train.detector import (
        create_detector_train_state,
        detector_train_step,
    )

    cfg = dataclasses.replace(YOLO_PLUS_V2, input_size=S)
    rng = np.random.default_rng(0)

    def batch(b=4):
        out = {
            "images": rng.uniform(0, 0.3, (b, S, S, 3)).astype(np.float32),
            "gt_boxes": np.zeros((b, 2, 4), np.float32),
            "gt_labels": np.zeros((b, 2), np.int32),
            "gt_mask": np.ones((b, 2), bool),
        }
        for i in range(b):
            for g in range(2):
                w, h = rng.integers(24, 48, 2)
                x1 = int(rng.integers(0, S - w))
                y1 = int(rng.integers(0, S - h))
                out["images"][i, y1 : y1 + h, x1 : x1 + w] = rng.uniform(
                    0.8, 1.0
                )
                out["gt_boxes"][i, g] = [x1, y1, x1 + w, y1 + h]
        return out

    model, state, tx = create_detector_train_state(
        cfg, lr=2e-3, dtype=jnp.float32
    )
    step = jax.jit(functools.partial(detector_train_step, model, tx))
    for _ in range(steps):
        state, _ = step(state, batch())
    return {"params": state.params, "batch_stats": state.batch_stats}


def _eval_row(img_dir, lbl_dir, out_dir, detector_args):
    """Run the e2e CLI and return the appended comparison_summary row with
    the volatile columns (fps) dropped."""
    from litepi_tpu.apps.e2e import main

    rc = main(
        [
            "--input", str(img_dir),
            "--labels", str(lbl_dir),
            "--num_classes", "3",
            "--det_input_size", str(S),
            "--batch_size", "2",
            "--max_det", "8",
            "--max_candidates", "64",
            "--num_samples", "4",
            "--output", str(out_dir),
            "--device", "cpu",
        ]
        + detector_args
    )
    assert rc == 0, detector_args
    rows = list(csv.reader(open(out_dir / "comparison_summary.csv")))
    header, row = rows[0], rows[-1]
    keep = [c for c in header if c != "fps"]
    return {c: v for c, v in zip(header, row) if c in keep}


@pytest.mark.slow
def test_train_emit_reingest_eval_identical(synth_dataset, tmp_path):
    from litepi_tpu.apps.convert import main as convert_main
    from litepi_tpu.weights.checkpoint import save_checkpoint

    img_dir, lbl_dir = synth_dataset
    variables = _train_tiny_v2()
    ckpt = tmp_path / "ckpt_v2"
    save_checkpoint(str(ckpt), variables)

    baseline = _eval_row(
        img_dir, lbl_dir, tmp_path / "eval_orbax", ["--detector", str(ckpt)]
    )
    # the trained detector must produce SOMETHING for equality to be a
    # non-vacuous check (metrics all-zero would compare equal trivially)
    assert baseline["num_test_images"] == "4"
    assert float(baseline["mean_recall"]) > 0, baseline

    emitted = {}
    for fmt in ("ncnn", "onnx", "openvino"):
        out = tmp_path / f"emit_{fmt}"
        rc = convert_main(
            [
                "--arch", "yolo_plus_v2",
                "--num_classes", "1",
                "--input", str(ckpt),
                "--output", str(out),
                "--emit", fmt,
                "--emit_input_size", str(S),
            ]
        )
        assert rc == 0, fmt
        emitted[fmt] = out

    ncnn_param = next(emitted["ncnn"].glob("**/*.param"))
    ncnn_bin = next(emitted["ncnn"].glob("**/*.bin"))
    onnx_path = next(emitted["onnx"].glob("**/*.onnx"))
    xml_path = next(emitted["openvino"].glob("**/*.xml"))

    rows = {
        "ncnn": _eval_row(
            img_dir, lbl_dir, tmp_path / "eval_ncnn",
            ["--detector_param", str(ncnn_param),
             "--detector_bin", str(ncnn_bin)],
        ),
        "onnx": _eval_row(
            img_dir, lbl_dir, tmp_path / "eval_onnx",
            ["--detector", str(onnx_path)],
        ),
        "openvino": _eval_row(
            img_dir, lbl_dir, tmp_path / "eval_openvino",
            ["--detector", str(xml_path)],
        ),
    }
    for fmt, row in rows.items():
        assert row == baseline, (
            f"{fmt} metrics diverge from the orbax run:\n"
            f"  orbax: {baseline}\n  {fmt}: {row}"
        )
