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
import os
import sys
import time

REFERENCE_E2E_FPS = 13.23

_T0 = time.time()


def progress(msg: str) -> None:
    """Phase progress on STDERR (stdout carries exactly one JSON line).

    The measured phases can individually run minutes behind the relay
    tunnel; without these lines a slow run is indistinguishable from a
    hung one."""
    print(f"[bench {time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


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
    p.add_argument("--max-candidates", type=int, default=64)
    # global classifier compaction: classify only the top-N crops by score
    # across the whole batch (PipelineConfig.cls_crop_budget).  Default 4
    # per frame on average — TT100K scenes carry ~2 signs at conf 0.25
    # (comparison_summary.csv: 3019 images / ~6k GT), and the per-frame
    # max_det=16 budget still covers the densest frame
    p.add_argument("--cls-crop-budget", type=int, default=None,
                   help="total crops classified per batch (default 4*batch)")
    # per-frame crop budget: slice NMS output to the top-8 slots per frame
    # before the ROI crop (score-descending, so a static slice).  8 = 4x
    # the reference's mean 2.1 detections/frame at serving conf; the dense
    # crop stage shrinks 2x (measured -1.7 ms/batch at B=128)
    p.add_argument("--crop-det-budget", type=int, default=8)
    # headline provenance: bench the INGESTED real shipped detector instead
    # of a random init (FLOP-identical at matching topology, but removes
    # the "benchmarked a random init" asterisk).  The record then carries
    # weights: "ncnn:<param basename>" instead of "random_init".
    p.add_argument("--detector-param", default=None,
                   help="NCNN .param of a real detector (with --detector-bin)")
    p.add_argument("--detector-bin", default=None)
    # approx_max_k candidate selection: TPU partial-reduce instead of the
    # sort-based exact top_k (0.12 vs 0.31 ms at B=128) — a serving knob
    # like the budgets; conf-clearing candidates retained at ~0.996
    # (measured; what approx loses is the all-tied background tail).
    # Parity/eval paths keep "exact".
    p.add_argument("--candidate-selector", default="approx",
                   choices=["exact", "approx"])
    # images vectorised per sequential step of the dense ROI crop
    # (PipelineConfig.roi_chunk; on-chip A/Bs at the D=8 serving budget:
    # 8 = 14.62 ms/batch headline, 16 and 4 both lose — see types.py)
    p.add_argument("--roi-chunk", type=int, default=8)
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed run into DIR",
    )
    p.add_argument(
        "--streaming-frames", type=int, default=256,
        help="frames for the decode-included streaming benchmark (0 = skip)",
    )
    p.add_argument(
        "--streaming-ram-batches", type=int, default=20,
        help="batches for the decode-excluded (RAM frames) streaming "
        "benchmark (0 = skip)",
    )
    p.add_argument(
        "--latency-batches", default="1,8",
        help="comma list of small batch sizes for the chip-true latency "
        "sweep ('' = skip).  Reference story: per-image P50/P95/P99 "
        "(runner.py:885-887)",
    )
    p.add_argument(
        "--streaming-ram-budget-s", type=float, default=150.0,
        help="wall-clock budget for the RAM-streaming trials: up to 3 "
        "best-of trials run, but no new trial starts past this budget "
        "(each trial ships n_batches x ~157 MB through the host link, "
        "which on a slow tunnel day can take minutes per trial)",
    )
    args = p.parse_args()

    # persistent compilation cache: repeat bench runs skip the CPU-side
    # recompiles (the TPU plugin manages its own; harmless there)
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/litepi_jax"),
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from litepi_tpu.core.types import NMSConfig, PipelineConfig
    from litepi_tpu.pipeline import TwoStagePipeline

    budget = (
        4 * args.batch if args.cls_crop_budget is None else args.cls_crop_budget
    )
    cfg = PipelineConfig(
        nms=NMSConfig(
            max_candidates=args.max_candidates, max_detections=args.max_det
        ),
        # bench the serving configuration: BGR host frames, RGB compute
        input_color="bgr",
        cls_crop_budget=budget,
        crop_det_budget=args.crop_det_budget,
        candidate_selector=args.candidate_selector,
        roi_chunk=args.roi_chunk,
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    progress(f"initializing pipeline (device={jax.devices()[0]})")
    pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=dtype)
    progress("pipeline initialized")

    rng = np.random.default_rng(0)
    frames_host = rng.integers(0, 256, (args.batch, 640, 640, 3), dtype=np.uint8)
    frames = jax.device_put(frames_host)
    conf = jnp.float32(cfg.benchmark_conf)
    n_iters = args.iters

    def make_fused_scan(pipe_obj, length):
        """Jitted length-iteration scan of pipe_obj's fused step.

        A data-dependent carry perturbation chains iterations so XLA cannot
        collapse the loop; the single-element in-place update keeps the
        dependency while avoiding a full-batch uint8 read+write per
        iteration (~0.7 ms/batch of pure measurement overhead at B=128,
        measured round 2b).  Shared by the headline, real-weights and
        latency measurements (one methodology, one definition)."""

        @jax.jit
        def bench(det_vars, cls_vars, frames):
            def body(carry, _):
                out = pipe_obj._fused_jit(
                    det_vars, cls_vars, (640, 640), conf, carry
                )
                bump = (out["cls_labels"].sum() % 2).astype(jnp.uint8)
                return carry.at[0, 0, 0, 0].add(bump), out["valid"].sum()

            _, counts = jax.lax.scan(body, frames, None, length=length)
            return counts

        return bench

    if args.mode == "scan":
        bench_n = make_fused_scan(pipe, n_iters)

        # NB: time until a HOST FETCH of the small per-iteration outputs
        # completes — on relayed/experimental platforms block_until_ready has
        # been observed to return before execution finishes, yielding
        # physically impossible numbers; a data fetch cannot lie.
        np.asarray(bench_n(pipe.det_vars, pipe.cls_vars, frames))
        progress(f"scan program (B={args.batch} x {n_iters} iters) compiled")
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
    progress(f"headline scan: {dt / n_iters * 1e3:.2f} ms/batch = {fps:.0f} FPS")

    # ---- real-weights provenance run --------------------------------- #
    # Same scan methodology on the INGESTED real shipped detector (vntsr
    # yolo_plus_v1, the reference's deployed artifact) so the record carries
    # a real-weights number next to the random-init flagship headline.
    # NB the shipped artifact is v1 (narrower than the v2 flagship), so the
    # two numbers measure different FLOP counts — provenance, not an A/B.
    real = None
    det_param = args.detector_param
    if det_param is None:
        cand = (
            "/root/reference/src/vntsr/convert/model/yolo_plus/"
            "yolo_plus_ncnn_model/model.ncnn.param"
        )
        det_param = cand if os.path.exists(cand) else None
    if det_param and args.mode == "scan":
        try:
            import dataclasses as _dc

            from litepi_tpu.weights.ncnn_import import convert_detector_ncnn

            det_vars_r, det_cfg_r = convert_detector_ncnn(
                det_param,
                args.detector_bin or det_param[: -len(".param")] + ".bin",
            )
            cfg_r = _dc.replace(cfg, detector=det_cfg_r)
            pipe_r = TwoStagePipeline(
                cfg_r, det_vars_r, pipe.cls_vars, dtype=dtype
            )
            bench_real = make_fused_scan(pipe_r, n_iters)
            np.asarray(bench_real(pipe_r.det_vars, pipe_r.cls_vars, frames))
            t0 = time.perf_counter()
            np.asarray(bench_real(pipe_r.det_vars, pipe_r.cls_vars, frames))
            dt_r = time.perf_counter() - t0
            real = {
                "weights": f"ncnn:{os.path.basename(det_param)}"
                f" ({det_cfg_r.name})",
                "fps": round(args.batch * n_iters / dt_r, 2),
                "latency_ms_per_batch": round(dt_r / n_iters * 1e3, 3),
            }
            progress(
                f"real-weights ({det_cfg_r.name}): "
                f"{real['fps']:.0f} FPS"
            )
        except Exception as e:  # provenance run must never sink the bench
            progress(f"real-weights run skipped: {e}")

    # ---- chip-true small-batch latency ------------------------------- #
    # The reference is a real-time pipeline reporting per-image latency
    # percentiles (runner.py:885-887).  Per-dispatch timing through the
    # relay is hopeless (hundreds of ms of tunnel RTT), so device latency
    # is derived relay-free from a two-point scan fit: time in-program
    # loops of two lengths and divide the difference — constant dispatch
    # overhead cancels exactly.
    latency = {}
    lat_batches = [
        int(b) for b in args.latency_batches.split(",") if b.strip()
    ] if args.latency_batches else []
    for b in lat_batches:
        # np.resize tiles cyclically, so a latency batch larger than
        # --batch still runs at the labeled size instead of silently
        # clamping to len(frames_host)
        fr = jax.device_put(
            np.resize(frames_host, (b,) + frames_host.shape[1:])
        )

        L1, L2 = 16, 64
        s1, s2 = make_fused_scan(pipe, L1), make_fused_scan(pipe, L2)
        samples = []
        for rep in range(6):
            t0 = time.perf_counter()
            np.asarray(s1(pipe.det_vars, pipe.cls_vars, fr))
            t1 = time.perf_counter()
            np.asarray(s2(pipe.det_vars, pipe.cls_vars, fr))
            t2 = time.perf_counter()
            if rep == 0:
                continue  # first pair pays both compiles
            samples.append(((t2 - t1) - (t1 - t0)) / (L2 - L1) * 1e3)
        samples.sort()
        p50 = samples[len(samples) // 2]
        latency[f"b{b}"] = {
            "ms_per_batch_p50": round(p50, 3),
            "ms_per_frame_p50": round(p50 / b, 3),
            "ms_per_batch_max": round(samples[-1], 3),
        }
        progress(f"latency b={b}: {p50:.2f} ms/batch p50")

    # Streaming number: JPEG decode + host->HBM transfer + fused compute,
    # through StreamingRunner's decode-ahead/dispatch-ahead path.  This is
    # the honest "frames start as JPEG bytes on the host" figure next to the
    # device-resident scan number (which measures pure device throughput).
    streaming = None
    if args.streaming_frames > 0:
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
            # decode-throughput probe: frames/s on ONE decode thread — with
            # it, streaming fps on N cores is predictable as
            # min(device_fps, N * decode_fps_core)
            streaming["decode_fps_core"] = round(
                runner.decode_probe(paths[:64], threads=1)["fps"], 2
            )
            # TT100K-shaped probe: sources are ~2048^2 (SURVEY §0), where
            # the DCT-scaled serving decode actually bites (640px bench
            # frames letterbox at r=1 — no scaling possible).  Records the
            # full-vs-scaled A/B so the lever's measured value (bounded by
            # Huffman entropy decode — see native/loader.cc) is in BENCH.
            rng_big = np.random.default_rng(0)
            big = cv2.resize(
                rng_big.integers(
                    30, 225, (64, 64, 3), dtype=np.uint8
                ),
                (2048, 2048),
                interpolation=cv2.INTER_CUBIC,
            )
            p_big = os.path.join(td, "tt100k_shaped.jpg")
            cv2.imwrite(p_big, big, [cv2.IMWRITE_JPEG_QUALITY, 90])
            big_paths = [p_big] * 48
            runner.decode_probe(big_paths[:4], threads=1)  # warm page cache
            streaming["decode_fps_core_2048_full"] = round(
                runner.decode_probe(
                    big_paths, threads=1, scaled_decode=False
                )["fps"], 2,
            )
            streaming["decode_fps_core_2048_scaled"] = round(
                runner.decode_probe(
                    big_paths, threads=1, scaled_decode=True
                )["fps"], 2,
            )
            runner.close()
        progress(f"streaming (JPEG-included): {streaming['fps']:.2f} FPS")

    # decode-EXCLUDED streaming: pre-decoded RAM frames through the same
    # dispatch-ahead window (host->HBM transfer + dispatch included) —
    # proves the overlap machinery separate from this host's decode floor
    streaming_ram = None
    if args.streaming_ram_batches > 0:
        from litepi_tpu.pipeline.streaming import StreamingRunner

        runner = StreamingRunner(pipe, batch_size=args.batch, inflight=2)
        # best-of-up-to-3: this path is dominated by relay-tunnel RTT whose
        # variance is large and one-sided (slow outliers); the max
        # estimates what the overlap machinery sustains, not the tunnel's
        # worst 20-batch window.  A wall-clock budget bounds the phase —
        # on a slow tunnel day one trial alone can take minutes, and a
        # bench that never finishes measures nothing.
        ram_t0 = time.perf_counter()
        ram_trials = []
        while len(ram_trials) < 3:
            ram_trials.append(
                runner.benchmark_ram(
                    frames_host, n_batches=args.streaming_ram_batches,
                    conf_threshold=cfg.benchmark_conf,
                )
            )
            progress(
                f"streaming RAM trial {len(ram_trials)}: "
                f"{ram_trials[-1]['fps']:.2f} FPS"
            )
            if time.perf_counter() - ram_t0 > args.streaming_ram_budget_s:
                break
        streaming_ram = max(ram_trials, key=lambda r: r["fps"])
        streaming_ram["trials"] = len(ram_trials)
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
        "weights": "random_init",
    }
    if real is not None:
        record["real_weights"] = real
    if latency:
        record["latency"] = latency
    if streaming is not None:
        record["streaming_fps"] = round(streaming["fps"], 2)
        record["streaming_frames"] = streaming["frames"]
        record["streaming_native_decoder"] = streaming["native_decoder"]
        record["decode_fps_core"] = streaming.get("decode_fps_core")
        record["decode_fps_core_2048_full"] = streaming.get(
            "decode_fps_core_2048_full"
        )
        record["decode_fps_core_2048_scaled"] = streaming.get(
            "decode_fps_core_2048_scaled"
        )
    if streaming_ram is not None:
        record["streaming_ram_fps"] = round(streaming_ram["fps"], 2)
        # methodology marker: best-of-up-to-3 under a wall-clock budget
        # since round 4 (r01/r02 were single-trial, r03 fixed best-of-3);
        # the tunnel's one-sided slow outliers made single trials
        # unrepresentative of the overlap machinery
        record["streaming_ram_trials"] = streaming_ram["trials"]
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
