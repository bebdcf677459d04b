"""Streaming / multi-mode app: camera, video, folder and single-image modes.

Re-creates the reference's ``full_appv3.py`` capability (reference:
src/tt100k/pipeline/full_appv3.py:584-649 — ``--mode
{camera,video,folder,single}``, per-frame detection+classification overlay,
EMA-smoothed FPS, VideoWriter output and per-frame CSV rows including empty
placeholders for no-detection frames :320-334,406-430) on the fused TPU
program.  Frames are batched per device call in video/folder modes —
the latency/throughput trade the Pi app could never make.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np


def draw_detections(frame, result, class_names, cls_conf_gate: float = 0.5):
    """Overlay boxes + labels (reference drawing loop, full_appv3.py:205-283;
    classifier label only shown above the cls-conf gate :274)."""
    import cv2

    n = 0
    for i in range(len(result["boxes"])):
        if not result["valid"][i]:
            continue
        x1, y1, x2, y2 = (int(v) for v in result["boxes"][i])
        det_conf = float(result["det_scores"][i])
        cls_id = int(result["cls_labels"][i])
        cls_conf = float(result["cls_scores"][i])
        name = class_names.get(cls_id, str(cls_id)) if class_names else str(cls_id)
        label = (
            f"{name} {cls_conf:.2f}" if cls_conf >= cls_conf_gate else f"sign {det_conf:.2f}"
        )
        cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 255, 0), 2)
        cv2.putText(
            frame, label, (x1, max(y1 - 6, 12)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
        )
        n += 1
    return n


def result_rows(
    frame_idx: int, result: Optional[Dict[str, np.ndarray]], class_names
) -> List[List[object]]:
    """Per-frame CSV rows; a no-detection frame emits one empty placeholder
    row (the reference's contract, full_appv3.py:320-334)."""
    rows: List[List[object]] = []
    if result is not None:
        for i in range(len(result["boxes"])):
            if not result["valid"][i]:
                continue
            x1, y1, x2, y2 = (float(v) for v in result["boxes"][i])
            cls_id = int(result["cls_labels"][i])
            name = (
                class_names.get(cls_id, str(cls_id)) if class_names else str(cls_id)
            )
            rows.append(
                [
                    frame_idx,
                    x1,
                    y1,
                    x2,
                    y2,
                    float(result["det_scores"][i]),
                    name,
                    float(result["cls_scores"][i]),
                ]
            )
    if not rows:
        rows.append([frame_idx, "", "", "", "", "", "", ""])
    return rows


CSV_HEADER = [
    "frame", "x1", "y1", "x2", "y2", "det_conf", "class_name", "cls_conf"
]


def _unbatch(out, i):
    return {k: np.asarray(v[i]) for k, v in out.items()}


def run_video(pipe, args, class_names) -> int:
    import cv2

    cap = cv2.VideoCapture(args.input)
    if not cap.isOpened():
        print(f"error: cannot open video {args.input}", file=sys.stderr)
        return 2
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps_in = cap.get(cv2.CAP_PROP_FPS) or 30.0
    writer = None
    if args.save_video:
        writer = cv2.VideoWriter(
            args.save_video, cv2.VideoWriter_fourcc(*"mp4v"), fps_in, (w, h)
        )
    csv_f = open(args.save_csv, "w", newline="") if args.save_csv else None
    csv_w = csv.writer(csv_f) if csv_f else None
    if csv_w:
        csv_w.writerow(CSV_HEADER)

    bs = args.batch_size
    ema_fps, frame_idx, done = 0.0, 0, False
    while not done:
        frames = []
        while len(frames) < bs:
            ok, frame = cap.read()
            if not ok:
                done = True
                break
            frames.append(frame)
        if not frames:
            break
        batch = np.stack(frames + [frames[-1]] * (bs - len(frames)))
        t0 = time.perf_counter()
        out = pipe.run_fused(batch, conf_threshold=args.conf)
        out = {k: np.asarray(v) for k, v in out.items()}
        dt = time.perf_counter() - t0
        inst_fps = len(frames) / dt
        # EMA smoothing 0.8/0.2 (full_appv3.py:317)
        ema_fps = inst_fps if ema_fps == 0 else 0.8 * ema_fps + 0.2 * inst_fps
        for i, frame in enumerate(frames):
            res = _unbatch(out, i)
            draw_detections(frame, res, class_names)
            cv2.putText(
                frame, f"FPS {ema_fps:.1f}", (10, 26),
                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 200, 255), 2,
            )
            if writer is not None:
                writer.write(frame)
            if csv_w:
                csv_w.writerows(result_rows(frame_idx, res, class_names))
            frame_idx += 1
        if frame_idx % (bs * 10) == 0:
            print(f"frame {frame_idx}  fps {ema_fps:.1f}")
    cap.release()
    if writer is not None:
        writer.release()
    if csv_f:
        csv_f.close()
    print(f"processed {frame_idx} frames, mean device fps {ema_fps:.1f}")
    return 0


def run_folder(pipe, args, class_names) -> int:
    import cv2

    from litepi_tpu.evals.labels import sample_images

    paths = sample_images(args.input)
    if not paths:
        print(f"error: no images in {args.input}", file=sys.stderr)
        return 2
    os.makedirs(args.output, exist_ok=True)
    csv_path = args.save_csv or os.path.join(args.output, "detections.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(CSV_HEADER)
        for idx, p in enumerate(paths):
            frame = cv2.imread(p)
            if frame is None:
                continue
            out = pipe.run_fused(frame[None], conf_threshold=args.conf)
            res = _unbatch({k: np.asarray(v) for k, v in out.items()}, 0)
            n = draw_detections(frame, res, class_names)
            w.writerows(result_rows(idx, res, class_names))
            cv2.imwrite(
                os.path.join(args.output, os.path.basename(p)), frame
            )
            print(f"{os.path.basename(p)}: {n} detections")
    return 0


def run_single(pipe, args, class_names) -> int:
    import cv2

    frame = cv2.imread(args.input)
    if frame is None:
        print(f"error: cannot read {args.input}", file=sys.stderr)
        return 2
    out = pipe.run_fused(frame[None], conf_threshold=args.conf)
    res = _unbatch({k: np.asarray(v) for k, v in out.items()}, 0)
    n = draw_detections(frame, res, class_names)
    out_path = args.save_image or "out_" + os.path.basename(args.input)
    cv2.imwrite(out_path, frame)
    print(f"{n} detections -> {out_path}")
    for i in range(len(res["boxes"])):
        if res["valid"][i]:
            cls_id = int(res["cls_labels"][i])
            name = (
                class_names.get(cls_id, str(cls_id)) if class_names else str(cls_id)
            )
            print(
                f"  box {np.round(res['boxes'][i], 1).tolist()} "
                f"det {res['det_scores'][i]:.3f} -> {name} ({res['cls_scores'][i]:.3f})"
            )
    return 0


def run_camera(pipe, args, class_names) -> int:
    """Live-camera loop (reference: full_appv2.py:166-207 / full_appv3.py:288).

    No camera exists on TPU hosts, so CI exercises this loop through a fake
    ``cv2.VideoCapture`` (tests/test_stream_app.py::test_camera_mode_loop);
    the loop ends when ``cap.read()`` stops delivering frames."""
    import cv2

    cap = cv2.VideoCapture(args.cam_id)
    if not cap.isOpened():
        print(f"error: cannot open camera {args.cam_id}", file=sys.stderr)
        return 2
    ema_fps = 0.0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            t0 = time.perf_counter()
            out = pipe.run_fused(frame[None], conf_threshold=args.conf)
            res = _unbatch({k: np.asarray(v) for k, v in out.items()}, 0)
            inst = 1.0 / max(time.perf_counter() - t0, 1e-6)
            ema_fps = inst if ema_fps == 0 else 0.8 * ema_fps + 0.2 * inst
            draw_detections(frame, res, class_names)
            cv2.putText(
                frame, f"FPS {ema_fps:.1f}", (10, 26),
                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 200, 255), 2,
            )
            if args.show_video:
                cv2.imshow("litepi_tpu", frame)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        cap.release()
        cv2.destroyAllWindows()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Streaming TSR app (TPU)")
    p.add_argument("--mode", default="single", choices=["camera", "video", "folder", "single"])
    p.add_argument("--input", default=None, help="video/image/folder path")
    p.add_argument("--cam_id", type=int, default=0)
    p.add_argument("--detector", default=None)
    p.add_argument(
        "--detector_variant", default="yolo_plus_v2",
        choices=["yolo_plus_v2", "yolo_plus_v1", "yolov8n"],
    )
    p.add_argument("--classifier", default=None)
    p.add_argument(
        "--clf_arch", default="efficientnet",
        choices=["resnet18", "efficientnet", "mobilenetv2", "shufflenetv2"],
    )
    p.add_argument("--num_classes", type=int, default=91)
    p.add_argument("--classes", default=None)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--yolo_iou", type=float, default=0.45)
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_det", type=int, default=16)
    p.add_argument("--output", default="stream_out")
    p.add_argument("--save_video", default=None)
    p.add_argument("--save_csv", default=None)
    p.add_argument("--save_image", default=None)
    p.add_argument("--show_video", action="store_true")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    args = p.parse_args(argv)

    if args.mode != "camera" and not args.input:
        print("error: --input required for this mode", file=sys.stderr)
        return 2

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from litepi_tpu.core.types import (
        NMSConfig,
        PipelineConfig,
        YOLO_PLUS_V1,
        YOLO_PLUS_V2,
        YOLOV8N,
    )
    from litepi_tpu.evals.labels import load_class_names
    from litepi_tpu.models import YoloLitePi, build_classifier
    from litepi_tpu.models.init_utils import fast_init
    from litepi_tpu.pipeline.two_stage import TwoStagePipeline
    from litepi_tpu.weights.checkpoint import load_checkpoint
    from litepi_tpu.weights.torch_import import (
        convert_classifier_state_dict,
        load_torch_state_dict,
    )

    det_cfg = {
        "yolo_plus_v2": YOLO_PLUS_V2,
        "yolo_plus_v1": YOLO_PLUS_V1,
        "yolov8n": YOLOV8N,
    }[args.detector_variant]
    cfg = PipelineConfig(
        detector=det_cfg,
        nms=NMSConfig(
            conf_threshold=args.conf,
            iou_threshold=args.yolo_iou,
            max_detections=args.max_det,
            max_candidates=256,
        ),
        classifier_arch=args.clf_arch,
        num_classifier_classes=args.num_classes,
        det_input_size=args.img_size,
        batch_size=args.batch_size,
        # cv2/native-loader frames are BGR; compute is RGB
        input_color="bgr",
    )

    det_model = YoloLitePi(cfg.detector, dtype=jnp.bfloat16)
    det = args.detector
    # the reference's multi-mode app runs an exported detector graph
    # directly (full_appv3.py:68 YOLOv8ONNX); accept the same artifact
    # forms the e2e CLI does, checked against --detector_variant
    try:
        if det and det.endswith(".onnx"):
            from litepi_tpu.weights.onnx_import import convert_detector_onnx

            det_vars = convert_detector_onnx(det, det_cfg.depths)
        elif det and det.endswith(".param"):
            from litepi_tpu.weights.ncnn_import import convert_detector_ncnn

            det_vars, _ = convert_detector_ncnn(
                det, det[: -len(".param")] + ".bin", det_cfg
            )
        elif det and det.endswith(".xml"):
            from litepi_tpu.weights.openvino_import import (
                convert_detector_openvino,
            )

            det_vars, _ = convert_detector_openvino(
                det, det[: -len(".xml")] + ".bin", det_cfg
            )
        elif det and det.endswith((".pt", ".pth")):
            from litepi_tpu.weights.onnx_import import defuse_state_dict
            from litepi_tpu.weights.torch_import import (
                convert_detector_state_dict,
            )

            det_vars = convert_detector_state_dict(
                defuse_state_dict(load_torch_state_dict(det)),
                det_cfg.depths,
            )
        elif det:
            det_vars = load_checkpoint(det)
        else:
            det_vars = fast_init(det_model, seed=0)
    except (OSError, ValueError, KeyError) as e:
        print(f"error: --detector: {e}", file=sys.stderr)
        return 2
    cls_model = build_classifier(args.clf_arch, args.num_classes, dtype=jnp.bfloat16)
    if args.classifier and args.classifier.endswith((".pth", ".pt")):
        cls_vars = convert_classifier_state_dict(
            args.clf_arch, load_torch_state_dict(args.classifier)
        )
    elif args.classifier and args.classifier.endswith(
        (".param", ".onnx", ".xml")
    ):
        # graph-form classifiers are the canonical ShuffleNetV2 emission
        # (deploy form; the pipeline recognises the folded variables)
        if args.clf_arch != "shufflenetv2":
            print(
                "error: graph-form --classifier covers shufflenetv2 (the "
                "deployed classifier); convert other archs from .pth",
                file=sys.stderr,
            )
            return 2
        try:
            if args.classifier.endswith(".param"):
                from litepi_tpu.weights.ncnn_import import (
                    convert_classifier_ncnn,
                )

                cls_vars, _ = convert_classifier_ncnn(
                    args.classifier,
                    args.classifier[: -len(".param")] + ".bin",
                )
            elif args.classifier.endswith(".onnx"):
                from litepi_tpu.weights.onnx_import import (
                    convert_classifier_onnx_fused,
                )

                cls_vars, _ = convert_classifier_onnx_fused(args.classifier)
            else:
                from litepi_tpu.weights.openvino_import import (
                    convert_classifier_openvino_fused,
                )

                cls_vars, _ = convert_classifier_openvino_fused(
                    args.classifier,
                    args.classifier[: -len(".xml")] + ".bin",
                )
        except (OSError, ValueError) as e:
            print(f"error: --classifier: {e}", file=sys.stderr)
            return 2
    elif args.classifier:
        cls_vars = load_checkpoint(args.classifier)
    else:
        cls_vars = fast_init(cls_model, seed=1)

    pipe = TwoStagePipeline(cfg, det_vars, cls_vars, dtype=jnp.bfloat16)
    class_names = load_class_names(args.classes)

    mode_fn = {
        "video": run_video,
        "folder": run_folder,
        "single": run_single,
        "camera": run_camera,
    }[args.mode]
    return mode_fn(pipe, args, class_names)


if __name__ == "__main__":
    sys.exit(main())
