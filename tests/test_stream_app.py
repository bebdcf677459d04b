"""Streaming app integration: video / folder / single modes on CPU,
checking the reference per-frame CSV contract (incl. empty placeholder rows)."""

import csv
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_video(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("video")
    path = str(root / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 200))
    rng = np.random.default_rng(0)
    for i in range(6):
        frame = rng.integers(0, 120, (200, 320, 3), dtype=np.uint8)
        cv2.rectangle(frame, (60, 50), (120, 110), (255, 255, 255), -1)
        w.write(frame)
    w.release()
    return path


COMMON = [
    "--device", "cpu", "--img_size", "160", "--batch_size", "2",
    "--max_det", "4", "--num_classes", "3", "--conf", "0.05",
]


@pytest.mark.slow
def test_video_mode(small_video, tmp_path):
    from litepi_tpu.apps.stream import main

    out_csv = str(tmp_path / "frames.csv")
    out_vid = str(tmp_path / "out.mp4")
    rc = main(
        ["--mode", "video", "--input", small_video,
         "--save_csv", out_csv, "--save_video", out_vid] + COMMON
    )
    assert rc == 0
    rows = list(csv.reader(open(out_csv)))
    assert rows[0] == [
        "frame", "x1", "y1", "x2", "y2", "det_conf", "class_name", "cls_conf"
    ]
    frames_seen = {int(r[0]) for r in rows[1:]}
    assert frames_seen == set(range(6))  # every frame has >= 1 row
    assert os.path.getsize(out_vid) > 0


def test_folder_mode(tmp_path):
    import cv2

    from litepi_tpu.apps.stream import main

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(1)
    # exactly one full batch: a trailing partial batch would compile a
    # second program shape and double this test's cost for no coverage
    for i in range(2):
        img = rng.integers(0, 255, (200, 320, 3), dtype=np.uint8)
        cv2.imwrite(str(src / f"i{i}.jpg"), img)
    out = tmp_path / "res"
    rc = main(["--mode", "folder", "--input", str(src), "--output", str(out)] + COMMON)
    assert rc == 0
    assert (out / "detections.csv").exists()
    assert sorted(os.listdir(out)) == ["detections.csv", "i0.jpg", "i1.jpg"]


def test_single_mode(tmp_path):
    import cv2

    from litepi_tpu.apps.stream import main

    img_path = str(tmp_path / "one.jpg")
    cv2.imwrite(
        img_path,
        np.random.default_rng(2).integers(0, 255, (200, 320, 3), dtype=np.uint8),
    )
    out_path = str(tmp_path / "annotated.jpg")
    rc = main(
        ["--mode", "single", "--input", img_path, "--save_image", out_path] + COMMON
    )
    assert rc == 0
    assert os.path.exists(out_path)


def test_missing_input_errors():
    from litepi_tpu.apps.stream import main

    assert main(["--mode", "video"]) == 2


def test_camera_mode_loop(monkeypatch, capsys):
    """Execute the camera loop without hardware: a fake cv2.VideoCapture
    delivers 3 synthetic frames then stops (reference: full_appv2.py:166-207,
    whose loop is likewise bounded only by the capture source)."""
    import cv2

    from litepi_tpu.apps.stream import main

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 255, (200, 320, 3), dtype=np.uint8) for _ in range(3)
    ]

    class FakeCapture:
        def __init__(self, cam_id):
            assert cam_id == 0
            self._left = list(frames)

        def isOpened(self):
            return True

        def read(self):
            if not self._left:
                return False, None
            return True, self._left.pop(0)

        def release(self):
            pass

    monkeypatch.setattr(cv2, "VideoCapture", FakeCapture)
    monkeypatch.setattr(cv2, "destroyAllWindows", lambda: None)
    rc = main(["--mode", "camera", "--cam_id", "0"] + COMMON)
    assert rc == 0


def test_camera_mode_unopenable(monkeypatch):
    import cv2

    from litepi_tpu.apps.stream import main

    class Closed:
        def __init__(self, cam_id):
            pass

        def isOpened(self):
            return False

    monkeypatch.setattr(cv2, "VideoCapture", Closed)
    assert main(["--mode", "camera"] + COMMON) == 2


def test_single_mode_with_graph_artifacts(tmp_path):
    """The stream app runs exported graphs directly — the reference's
    full_appv3 pattern (ONNX detector :68, classifier sidecar): --detector
    foo.onnx + --classifier foo.xml load through the ingestion paths."""
    import cv2
    import jax

    from litepi_tpu.apps.stream import main
    from litepi_tpu.core.types import YOLO_PLUS_V2
    from litepi_tpu.models import YoloLitePi, build_classifier
    from litepi_tpu.weights.onnx_export import export_detector_onnx
    from litepi_tpu.weights.openvino_export import export_classifier_openvino

    det_model = YoloLitePi(YOLO_PLUS_V2)
    det_vars = det_model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    onnx_p = tmp_path / "det.onnx"
    export_detector_onnx(det_vars, YOLO_PLUS_V2, str(onnx_p))

    clf = build_classifier("shufflenetv2", 3)
    clf_vars = clf.init(
        jax.random.PRNGKey(1), np.zeros((1, 64, 64, 3), np.float32),
        train=False,
    )
    xml_p = tmp_path / "clf.xml"
    export_classifier_openvino("shufflenetv2", clf_vars, 3, str(xml_p))

    img_path = str(tmp_path / "one.jpg")
    cv2.imwrite(
        img_path,
        np.random.default_rng(2).integers(0, 255, (200, 320, 3), np.uint8),
    )
    out_path = str(tmp_path / "annotated.jpg")
    rc = main(
        ["--mode", "single", "--input", img_path, "--save_image", out_path,
         "--detector", str(onnx_p), "--classifier", str(xml_p),
         "--clf_arch", "shufflenetv2"] + COMMON
    )
    assert rc == 0
    assert os.path.exists(out_path)


def test_stream_detector_artifact_pointed_error(tmp_path, capsys):
    from litepi_tpu.apps.stream import main

    bad = tmp_path / "det.onnx"
    bad.write_bytes(b"not a protobuf")
    img_path = str(tmp_path / "one.jpg")
    import cv2

    cv2.imwrite(img_path, np.zeros((64, 64, 3), np.uint8))
    rc = main(
        ["--mode", "single", "--input", img_path,
         "--output", str(tmp_path / "o"), "--detector", str(bad)] + COMMON
    )
    assert rc == 2
    assert "--detector" in capsys.readouterr().err
