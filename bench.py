"""End-to-end throughput benchmark on real hardware.

Measures the headline metric from BASELINE.json: e2e frames/sec/chip at
640x640 through the fused two-stage program (letterbox -> detector -> DFL
decode -> NMS -> ROI crop -> classifier), flagship yolo_plus_v2 +
ShuffleNetV2-91.  Reference baseline: the Pi-5 NCNN pipeline's 13.23 FPS on
TT100K (src/tt100k/pipeline/output_eval/comparison_summary.csv:4).

Measurement method: the fused step is iterated *inside one XLA program*
(``lax.scan`` with a data dependency between iterations) and timed with a
single dispatch+block.  In this environment the TPU sits behind a relay whose
per-dispatch overhead is large and time-varying (hundreds of ms), while true
device compute is steady — the in-program loop measures the device, not the
tunnel.  ``--mode dispatch`` keeps the naive per-call loop for comparison.

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE_E2E_FPS = 13.23


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--mode", default="scan", choices=["scan", "dispatch"])
    # serving budget: 16 sign slots per frame at conf 0.25 (TT100K scenes
    # carry a handful of signs; the eval CLI uses larger eval budgets)
    p.add_argument("--max-det", type=int, default=16)
    p.add_argument("--max-candidates", type=int, default=256)
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed run into DIR",
    )
    p.add_argument(
        "--streaming-frames", type=int, default=256,
        help="frames for the decode-included streaming benchmark (0 = skip)",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from litepi_tpu.core.types import NMSConfig, PipelineConfig
    from litepi_tpu.pipeline import TwoStagePipeline

    cfg = PipelineConfig(
        nms=NMSConfig(
            max_candidates=args.max_candidates, max_detections=args.max_det
        )
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=dtype)

    rng = np.random.default_rng(0)
    frames_host = rng.integers(0, 256, (args.batch, 640, 640, 3), dtype=np.uint8)
    frames = jax.device_put(frames_host)
    conf = jnp.float32(cfg.benchmark_conf)
    n_iters = args.iters

    if args.mode == "scan":

        @jax.jit
        def bench_n(det_vars, cls_vars, frames):
            def body(carry, _):
                out = pipe._fused_jit(
                    det_vars, cls_vars, (640, 640), conf, carry
                )
                # data-dependent perturbation chains iterations so XLA cannot
                # collapse the loop.  A single-element in-place carry update
                # keeps the dependency while avoiding a full-batch uint8
                # read+write per iteration (~0.7 ms/batch of pure
                # measurement overhead at B=128, measured round 2b)
                bump = (out["cls_labels"].sum() % 2).astype(jnp.uint8)
                return carry.at[0, 0, 0, 0].add(bump), out["valid"].sum()
            _, counts = jax.lax.scan(body, frames, None, length=n_iters)
            return counts

        # NB: time until a HOST FETCH of the small per-iteration outputs
        # completes — on relayed/experimental platforms block_until_ready has
        # been observed to return before execution finishes, yielding
        # physically impossible numbers; a data fetch cannot lie.
        np.asarray(bench_n(pipe.det_vars, pipe.cls_vars, frames))
        for _ in range(args.warmup):
            np.asarray(bench_n(pipe.det_vars, pipe.cls_vars, frames))
        import contextlib

        prof = (
            jax.profiler.trace(args.profile)
            if args.profile
            else contextlib.nullcontext()
        )
        with prof:
            t0 = time.perf_counter()
            counts = np.asarray(bench_n(pipe.det_vars, pipe.cls_vars, frames))
            dt = time.perf_counter() - t0
        assert counts.shape[0] == n_iters
    else:
        def run():
            return pipe.run_fused(frames, conf_threshold=cfg.benchmark_conf)

        for _ in range(max(args.warmup, 1)):
            jax.block_until_ready(run())
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = run()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0

    fps = args.batch * n_iters / dt

    # Streaming number: JPEG decode + host->HBM transfer + fused compute,
    # through StreamingRunner's decode-ahead/dispatch-ahead path.  This is
    # the honest "frames start as JPEG bytes on the host" figure next to the
    # device-resident scan number (which measures pure device throughput).
    streaming = None
    if args.streaming_frames > 0:
        import os
        import tempfile

        import cv2

        from litepi_tpu.pipeline.streaming import StreamingRunner

        with tempfile.TemporaryDirectory() as td:
            paths = []
            for i in range(args.streaming_frames):
                p_ = os.path.join(td, f"f{i:04d}.jpg")
                cv2.imwrite(
                    p_, frames_host[i % args.batch],
                    [cv2.IMWRITE_JPEG_QUALITY, 90],
                )
                paths.append(p_)
            runner = StreamingRunner(pipe, batch_size=args.batch, inflight=2)
            streaming = runner.benchmark(paths, cfg.benchmark_conf)
            runner.close()

    record = {
        "metric": "e2e_frames_per_sec_640",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_E2E_FPS, 2),
        "batch": args.batch,
        "iters": n_iters,
        "mode": args.mode,
        "dtype": args.dtype,
        "device": str(jax.devices()[0]),
        "latency_ms_per_batch": round(dt / n_iters * 1e3, 3),
    }
    if streaming is not None:
        record["streaming_fps"] = round(streaming["fps"], 2)
        record["streaming_frames"] = streaming["frames"]
        record["streaming_native_decoder"] = streaming["native_decoder"]
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
