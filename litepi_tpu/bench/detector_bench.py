"""Detector fair-benchmark: per-variant accuracy + per-stage speed.

Re-creates the reference's detector benchmark notebooks:

* ``evaluation_tsd.ipynb`` cell 5 — per-backend accuracy (Ultralytics val)
  plus dummy-input speed: warmup 5 / timed 20 iterations on (1,3,640,640).
  Here "backends" collapse to one XLA program per detector variant; the
  speed protocol is preserved (warmup + timed loop, batch-1 latency AND
  large-batch throughput, which is the number that matters on TPU).
* ``evaluation_tsd_single_img.ipynb`` cells 1-10 — per-stage
  preprocess / inference / postprocess milliseconds with pre/post shared
  across all contenders ("DÙNG CHUNG CHO TẤT CẢ"), 50 sampled images,
  seed 42.
* ``evaluation_tsd_single_img_other.ipynb`` cells 1-3 — the Faster-RCNN /
  SSD300 FPS rows (``Eval/detect_eval_results_fps_rcnn_ssd.csv``), with
  their own 300x300 / plain-resize pre+post.
* ``eval-other-model-tsd-*.ipynb`` cell 1 — mAP of the non-YOLO baselines,
  here via :func:`evaluate_detector` on any labelled folder.

Outputs a list of row dicts matching the reference CSV columns
(model, backend, infer_ms, total_ms, fps) plus stage decomposition and,
when a labelled folder is given, reference-exact mAP columns.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from litepi_tpu.core.types import (
    DetectorConfig,
    YOLO_PLUS_V1,
    YOLO_PLUS_V2,
    YOLOV8N,
)

# anchor-free YoloLitePi-family variants (the {reg, cls} head contract)
LITE_VARIANTS: Dict[str, DetectorConfig] = {
    "yolo_plus_v2": YOLO_PLUS_V2,
    "yolo_plus_v1": YOLO_PLUS_V1,
    "yolov8n": YOLOV8N,
}
# every benchmarkable variant (reference README.md:39-42 baselines plus the
# RCNN/SSD rows of detect_eval_results_fps_rcnn_ssd.csv)
ALL_VARIANTS = (
    "yolo_plus_v2",
    "yolo_plus_v1",
    "yolov8n",
    "yolov11n",
    "yolov5n",  # the u-variant the reference actually deployed
    "yolov5n_legacy",  # classic 3-prior anchor head + v5 decode
    "ssd300",
    "faster_rcnn",
)


@dataclasses.dataclass
class DetectorHarness:
    """One detector variant's staged programs.

    ``pre``: device frames (B, H, W, 3) uint8 -> model input;
    ``infer``: model input -> raw head outputs;
    ``post``: raw outputs -> (boxes, scores, class_ids, valid) padded,
    boxes in model-input pixel space;
    ``geometry``: 'letterbox' (YOLO family) or 'resize' (SSD/RCNN plain
    resize) — how to map boxes back to original pixels.
    """

    name: str
    input_size: int
    geometry: str
    pre: Callable
    infer: Callable
    post: Callable

    def predict(self, frames: np.ndarray):
        return self.post(self.infer(self.pre(frames)))

    def unmap_boxes(
        self, boxes: np.ndarray, orig_w: int, orig_h: int
    ) -> np.ndarray:
        """Model-input-space -> original-pixel boxes (host numpy)."""
        from litepi_tpu.ops.letterbox import letterbox_params

        if self.geometry == "letterbox":
            r, dw, dh, _, _ = letterbox_params(orig_h, orig_w, self.input_size)
            out = (boxes - np.asarray([dw, dh, dw, dh])) / r
        else:  # plain resize
            sx = orig_w / self.input_size
            sy = orig_h / self.input_size
            out = boxes * np.asarray([sx, sy, sx, sy])
        out[..., [0, 2]] = out[..., [0, 2]].clip(0, orig_w)
        out[..., [1, 3]] = out[..., [1, 3]].clip(0, orig_h)
        return out


def make_harness(
    variant: str,
    input_size: int = 640,
    dtype: str = "bfloat16",
    seed: int = 0,
    num_classes: int = 1,
    conf: float = 0.25,
    iou: float = 0.45,
    max_detections: int = 64,
    max_candidates: int = 256,
    det_vars=None,
    input_color: str = "rgb",
) -> DetectorHarness:
    """Build the staged programs for any benchmarkable variant.

    SSD300 / Faster-RCNN use their own pre/post (plain resize, SSD at a
    fixed 300x300) exactly as the reference benchmarks them separately
    (evaluation_tsd_single_img_other.ipynb); the YOLO family shares the
    letterbox pre and NMS post.

    ``input_color="bgr"`` reverses the channel axis in ``pre`` (cv2-fed
    frames; model compute is RGB — the framework convention).
    """
    import jax
    import jax.numpy as jnp

    from litepi_tpu.models.init_utils import fast_init
    from litepi_tpu.ops.letterbox import letterbox_device
    from litepi_tpu.ops.nms import nms_sorted

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    def _to_rgb(f):
        return f[..., ::-1] if input_color == "bgr" else f

    if variant in LITE_VARIANTS or variant in ("yolov11n", "yolov5n"):
        from litepi_tpu.ops.anchors import make_anchors
        from litepi_tpu.ops.dfl import decode_candidates

        if variant == "yolov11n":
            from litepi_tpu.models.yolov11 import YoloV11

            model = YoloV11(num_classes=num_classes, dtype=jdtype)
            reg_max = 16
            strides = (8, 16, 32)
        elif variant == "yolov5n":
            # the deployed yolo5 artifact is the anchor-free u-variant
            # (models/yolov5.py docstring) — same head contract as v8
            from litepi_tpu.models.yolov5 import YoloV5

            model = YoloV5(
                num_classes=num_classes, dtype=jdtype, anchor_free=True
            )
            reg_max = 16
            strides = (8, 16, 32)
        else:
            cfg = dataclasses.replace(
                LITE_VARIANTS[variant],
                num_classes=num_classes,
                input_size=input_size,
            )
            from litepi_tpu.models import YoloLitePi

            model = YoloLitePi(cfg, dtype=jdtype)
            reg_max = cfg.reg_max
            strides = cfg.strides
        variables = det_vars or fast_init(model, seed=seed)
        pts, strd = make_anchors(input_size, strides)
        anchors_j = jnp.asarray(pts)
        strides_j = jnp.asarray(strd)

        pre = jax.jit(
            lambda f: letterbox_device(_to_rgb(f), input_size, jdtype)
            * (1.0 / 255.0)
        )
        infer = jax.jit(lambda x: model.apply(variables, x, train=False))
        post = jax.jit(
            lambda out: nms_sorted(
                *decode_candidates(
                    out, anchors_j, strides_j, reg_max, max_candidates
                ),
                conf, iou, max_detections,
            )
        )
        return DetectorHarness(variant, input_size, "letterbox", pre, infer, post)

    if variant == "yolov5n_legacy":
        from litepi_tpu.models.yolov5 import (
            YoloV5,
            v5_anchor_table,
            v5_candidates,
        )

        model = YoloV5(num_classes=num_classes, dtype=jdtype)
        variables = det_vars or fast_init(model, seed=seed)
        g, s, a = v5_anchor_table(input_size)
        g_j, s_j, a_j = jnp.asarray(g), jnp.asarray(s), jnp.asarray(a)

        pre = jax.jit(
            lambda f: letterbox_device(_to_rgb(f), input_size, jdtype)
            * (1.0 / 255.0)
        )
        infer = jax.jit(lambda x: model.apply(variables, x, train=False))
        post = jax.jit(
            lambda out: nms_sorted(
                *v5_candidates(out["pred"], g_j, s_j, a_j, max_candidates),
                conf, iou, max_detections,
            )
        )
        return DetectorHarness(variant, input_size, "letterbox", pre, infer, post)

    if variant == "ssd300":
        from litepi_tpu.models.ssd import (
            SSD300,
            decode_ssd_boxes,
            ssd_default_boxes,
        )
        from litepi_tpu.ops.boxes import clip_boxes

        size = 300
        model = SSD300(num_classes=num_classes, dtype=jdtype)
        variables = det_vars or fast_init(model, seed=seed, spatial=size)
        db = jnp.asarray(ssd_default_boxes(size))

        pre = jax.jit(
            lambda f: jax.image.resize(
                _to_rgb(f).astype(jnp.float32),
                (f.shape[0], size, size, 3),
                "bilinear",
            ).astype(jdtype)
            * (1.0 / 255.0)
        )
        infer = jax.jit(lambda x: model.apply(variables, x, train=False))

        def _post(out):
            probs = jax.nn.softmax(out["conf"], axis=-1)[..., 1:]  # drop bg
            scores = probs.max(-1)
            labels = probs.argmax(-1).astype(jnp.int32)
            boxes = clip_boxes(decode_ssd_boxes(out["loc"], db), size, size)
            order = jnp.argsort(-scores, axis=-1)[..., :max_candidates]
            boxes = jnp.take_along_axis(boxes, order[..., None], 1)
            scores = jnp.take_along_axis(scores, order, 1)
            labels = jnp.take_along_axis(labels, order, 1)
            return nms_sorted(
                boxes, scores, labels, conf, iou, max_detections,
                use_pallas=False,
            )

        return DetectorHarness(
            variant, size, "resize", pre, infer, jax.jit(_post)
        )

    if variant == "faster_rcnn":
        from litepi_tpu.models.faster_rcnn import (
            FasterRCNN,
            postprocess_detections,
        )

        model = FasterRCNN(
            num_classes=num_classes, input_size=input_size, dtype=jdtype
        )
        if det_vars is None:
            # parameters are spatial-size independent (fully conv up to the
            # fixed 7x7 RoIAlign): init a tiny-input twin to skip the
            # full-res trace
            tiny = FasterRCNN(
                num_classes=num_classes,
                input_size=64,
                pre_nms_topk=64,
                post_nms_topk=16,
                dtype=jdtype,
            )
            det_vars = fast_init(tiny, seed=seed, spatial=64)
        variables = det_vars

        pre = jax.jit(
            lambda f: jax.image.resize(
                _to_rgb(f).astype(jnp.float32),
                (f.shape[0], input_size, input_size, 3),
                "bilinear",
            ).astype(jdtype)
            * (1.0 / 255.0)
        )
        infer = jax.jit(lambda x: model.apply(variables, x, train=False))
        post = jax.jit(
            lambda out: postprocess_detections(
                out, input_size, conf, iou, max_detections
            )
        )
        return DetectorHarness(
            variant, input_size, "resize", pre, infer, post
        )

    raise ValueError(f"unknown detector variant: {variant!r}")


def benchmark_detector(
    variant: str = "yolo_plus_v2",
    det_vars=None,
    batch: int = 1,
    warmup: int = 5,
    iters: int = 20,
    input_size: int = 640,
    dtype: str = "bfloat16",
    images: Optional[np.ndarray] = None,
    seed: int = 42,
) -> Dict[str, float]:
    """Warmup-then-timed detector benchmark, reference protocol
    (evaluation_tsd.ipynb cell 5: dummy input, warmup 5, timed 20).

    Stage decomposition (pre / forward / decode+NMS) follows the
    single-image notebook's pre / infer / post split.
    """
    import jax

    h = make_harness(variant, input_size=input_size, dtype=dtype, det_vars=det_vars)

    rng = np.random.default_rng(seed)
    if images is None:
        images = rng.integers(
            0, 256, (batch, input_size, input_size, 3), np.uint8
        )
    frames = jax.device_put(images)

    def sync(tree):
        # A HOST FETCH of one element is the only trustworthy barrier on
        # relayed platforms — block_until_ready has been observed returning
        # before execution completes (impossible sub-ms R50-FPN timings).
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(jax.numpy.ravel(leaf)[0])
        return tree

    def stage_times():
        t0 = time.perf_counter()
        x = sync(h.pre(frames))
        t1 = time.perf_counter()
        raw = sync(h.infer(x))
        t2 = time.perf_counter()
        sync(h.post(raw))
        t3 = time.perf_counter()
        return (t1 - t0) * 1e3, (t2 - t1) * 1e3, (t3 - t2) * 1e3

    for _ in range(warmup):
        stage_times()
    pre = inf = post = 0.0
    for _ in range(iters):
        a, b, c = stage_times()
        pre += a
        inf += b
        post += c
    pre, inf, post = pre / iters, inf / iters, post / iters
    total = pre + inf + post
    return {
        "model": variant,
        "backend": "xla",
        "batch": batch,
        "pre_ms": round(pre, 3),
        "infer_ms": round(inf, 3),
        "post_ms": round(post, 3),
        "total_ms": round(total, 3),
        "fps": round(batch / (total / 1e3), 2),
    }


def evaluate_detector(
    variant: str,
    images_dir: str,
    labels_dir: str,
    det_vars=None,
    num_classes: int = 1,
    input_size: int = 640,
    dtype: str = "float32",
    conf: float = 0.001,
    iou: float = 0.45,
    max_detections: int = 300,
    max_images: Optional[int] = 50,
    seed: int = 42,
) -> Dict[str, float]:
    """Detection mAP of any variant on a YOLO-format labelled folder —
    the RCNN/SSD analog of the reference's ``eval-other-model-tsd-*.ipynb``
    (cell 1) run through the reference-exact evaluator."""
    import cv2
    import jax

    from litepi_tpu.evals.labels import parse_yolo_label, sample_images
    from litepi_tpu.evals.reference import evaluate_predictions_reference

    h = make_harness(
        variant,
        input_size=input_size,
        dtype=dtype,
        det_vars=det_vars,
        num_classes=num_classes,
        conf=conf,
        iou=iou,
        max_detections=max_detections,
        max_candidates=max(1024, max_detections),
        input_color="bgr",  # frames below come from cv2.imread
    )
    import os

    from litepi_tpu.ops.letterbox import letterbox_host

    paths = sample_images(images_dir, max_images, seed=seed)
    all_preds, all_gts = [], []
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            continue
        # fixed-shape canvas BEFORE the jitted programs: feeding raw frames
        # would recompile the device pre once per distinct source
        # resolution (up to one compile per image on mixed datasets)
        if h.geometry == "letterbox":
            canvas, _, _ = letterbox_host(img, h.input_size)
        else:
            canvas = cv2.resize(
                img, (h.input_size, h.input_size),
                interpolation=cv2.INTER_LINEAR,
            )
        b, s, c, v = (
            np.asarray(x)
            for x in jax.block_until_ready(h.predict(canvas[None]))
        )
        keep = v[0]
        boxes = h.unmap_boxes(b[0][keep], img.shape[1], img.shape[0])
        all_preds.append((boxes, s[0][keep], c[0][keep].astype(np.int64)))
        lp = os.path.join(
            labels_dir, os.path.splitext(os.path.basename(p))[0] + ".txt"
        )
        gb, gc = parse_yolo_label(lp, img.shape[1], img.shape[0])
        all_gts.append((gb, gc.astype(np.int64)))

    m = evaluate_predictions_reference(all_preds, all_gts, num_classes)
    return {
        "model": variant,
        "num_images": len(all_preds),
        "mAP50": round(float(m["mAP50"]), 4),
        "mAP50_95": round(float(m["mAP50_95"]), 4),
        "precision": round(float(m["mean_precision"]), 4),
        "recall": round(float(m["mean_recall"]), 4),
    }


def run_fair_benchmark(
    variants: Sequence[str] = ("yolo_plus_v2", "yolo_plus_v1", "yolov8n"),
    **kw,
) -> List[Dict[str, float]]:
    """Benchmark every variant under identical protocol (YOLO family shares
    pre/post; SSD/RCNN use their own, like the reference's separate
    notebook) — the fair-comparison contract of
    evaluation_tsd_single_img.ipynb."""
    return [benchmark_detector(v, **kw) for v in variants]


def main(argv=None) -> int:  # pragma: no cover - exercised on hardware
    import argparse
    import json
    import sys

    p = argparse.ArgumentParser(description="Detector fair benchmark (TPU)")
    p.add_argument(
        "--variants", nargs="+", default=["yolo_plus_v2"],
        choices=list(ALL_VARIANTS),
    )
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--input_size", type=int, default=640)
    p.add_argument("--images", default=None, help="labelled folder -> adds mAP")
    p.add_argument("--labels", default=None)
    p.add_argument("--num_classes", type=int, default=1)
    p.add_argument("--max_images", type=int, default=50)
    p.add_argument(
        "--checkpoint", default=None,
        help="orbax dir from a training CLI (train_detector/train_baselines "
        "best|last) — benches the trained weights instead of random init; "
        "applies to the single variant given",
    )
    args = p.parse_args(argv)
    det_vars = None
    if args.checkpoint:
        if len(args.variants) != 1:
            print("error: --checkpoint applies to exactly one variant",
                  file=sys.stderr)
            return 2
        from litepi_tpu.weights.checkpoint import load_checkpoint

        det_vars = load_checkpoint(args.checkpoint)
    for v in args.variants:
        row = benchmark_detector(
            v,
            det_vars=det_vars,
            batch=args.batch,
            iters=args.iters,
            warmup=args.warmup,
            input_size=args.input_size,
        )
        if args.images and args.labels:
            row.update(
                evaluate_detector(
                    v,
                    args.images,
                    args.labels,
                    det_vars=det_vars,
                    num_classes=args.num_classes,
                    input_size=args.input_size,
                    max_images=args.max_images,
                )
            )
        print(json.dumps(row))
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())
