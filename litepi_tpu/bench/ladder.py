"""Multi-level optimisation experiment — the reference's ``runner.py`` story
retold in TPU terms.

The reference's ladder (reference: src/vntsr/pipeline/runner.py:271-705):
L0 plain compile -> L1 model choice -> L2 runtime hints + pre-bound tensors +
batch-4 classify -> L3 efficient NMS + memory pooling + batch 8 -> L4 cpu
governor + batch 16.  Those knobs are CPU-engine concepts; the equivalent
levers on TPU are program structure and batching:

=====  ==============================================================
L0     staged programs, batch 1, float32 — the naive per-image port
L1     model choice (smaller classifier), still batch 1
L2     batched staged programs (batch 8), bfloat16 compute
L3     fused single program (detect->NMS->crop->classify), batch 8
L4     fused program, large batch (64), serving detection budget
=====  ==============================================================

Each level runs warmup + measured iterations and reports mean/P50/P95/P99
latency and FPS (the reference's per-level summary, runner.py:871-928), then
a comparison report + LaTeX row set (runner.py:937-1008).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import numpy as np

from litepi_tpu.core.metrics import percentile_summary
from litepi_tpu.core.types import PipelineConfig
from litepi_tpu.pipeline.two_stage import TwoStagePipeline


@dataclasses.dataclass
class LevelSpec:
    name: str
    description: str
    batch: int
    fused: bool
    dtype: str = "bfloat16"
    classifier: str = "shufflenetv2"
    max_detections: int = 64


LEVELS: List[LevelSpec] = [
    LevelSpec(
        "Level 0", "staged per-image, float32 (naive port)", 1, False, "float32"
    ),
    LevelSpec("Level 1", "model choice: lightest classifier", 1, False, "float32"),
    LevelSpec("Level 2", "batched staged programs, bfloat16", 8, False),
    LevelSpec("Level 3", "fused single program, batch 8", 8, True),
    LevelSpec(
        "Level 4", "fused, batch 64, serving budget", 64, True, max_detections=16
    ),
]


class OptimizationExperiment:
    """Lazy per-level pipelines + measurement loops (the reference's
    ``OptimizationExperiment``, runner.py:710-928)."""

    def __init__(
        self,
        base_cfg: Optional[PipelineConfig] = None,
        frame_hw=(640, 640),
        levels: Optional[List[LevelSpec]] = None,
    ) -> None:
        self.base_cfg = base_cfg or PipelineConfig()
        self.frame_hw = frame_hw
        self.levels = levels if levels is not None else LEVELS
        self._pipes: Dict[str, TwoStagePipeline] = {}
        self.results: Dict[str, Dict[str, float]] = {}

    def _get_pipeline(self, spec: LevelSpec) -> TwoStagePipeline:
        import jax.numpy as jnp

        key = f"{spec.dtype}-{spec.classifier}-{spec.max_detections}"
        if key not in self._pipes:
            cfg = dataclasses.replace(
                self.base_cfg,
                classifier_arch=spec.classifier,
                nms=dataclasses.replace(
                    self.base_cfg.nms, max_detections=spec.max_detections
                ),
            )
            dtype = jnp.bfloat16 if spec.dtype == "bfloat16" else jnp.float32
            self._pipes[key] = TwoStagePipeline.initialize(cfg, dtype=dtype)
        return self._pipes[key]

    def _run_once(self, pipe: TwoStagePipeline, spec: LevelSpec, frames):
        import jax

        if spec.fused:
            return jax.block_until_ready(pipe.run_fused(frames, 0.25))
        # staged: detect on device, ROI on host, classify on device —
        # the reference's HybridPipeline structure
        canvas01 = frames.astype(np.float32) / 255.0
        det = jax.block_until_ready(pipe.detect(canvas01, 0.25))
        crops = np.zeros(
            (len(frames), pipe.cfg.cls_input_size, pipe.cfg.cls_input_size, 3),
            np.float32,
        )
        return jax.block_until_ready(pipe.classify(crops))

    def run_single_level(
        self,
        spec: LevelSpec,
        warmup: int = 3,
        iterations: int = 10,
        frames: Optional[np.ndarray] = None,
    ) -> Dict[str, float]:
        rng = np.random.default_rng(0)
        if frames is None:
            h, w = self.frame_hw
            frames = rng.integers(0, 256, (spec.batch, h, w, 3), dtype=np.uint8)
        pipe = self._get_pipeline(spec)

        for _ in range(warmup):
            self._run_once(pipe, spec, frames)
        lat = []
        for _ in range(iterations):
            t0 = time.perf_counter()
            self._run_once(pipe, spec, frames)
            lat.append((time.perf_counter() - t0) * 1e3)
        stats = percentile_summary(lat)
        stats["fps"] = spec.batch / (stats["mean"] / 1e3)
        stats["batch"] = spec.batch
        self.results[spec.name] = stats
        self._print_level_summary(spec, stats)
        return stats

    def run_all_levels(self, **kw) -> Dict[str, Dict[str, float]]:
        for spec in self.levels:
            self.run_single_level(spec, **kw)
        return self.results

    @staticmethod
    def _print_level_summary(spec: LevelSpec, s: Dict[str, float]) -> None:
        print(
            f"{spec.name} ({spec.description}): "
            f"fps={s['fps']:.1f} mean={s['mean']:.1f}ms "
            f"p50={s['p50']:.1f} p95={s['p95']:.1f} p99={s['p99']:.1f}"
        )

    def generate_comparison_report(self) -> str:
        if not self.results:
            return "(no results)"
        base = next(iter(self.results.values()))["fps"]
        lines = ["level,description,batch,fps,mean_ms,p50_ms,p95_ms,p99_ms,speedup_vs_L0"]
        for spec in self.levels:
            if spec.name not in self.results:
                continue
            s = self.results[spec.name]
            lines.append(
                f"{spec.name},{spec.description},{s['batch']},"
                f"{s['fps']:.2f},{s['mean']:.2f},{s['p50']:.2f},"
                f"{s['p95']:.2f},{s['p99']:.2f},{s['fps'] / base:.2f}"
            )
        return "\n".join(lines)

    def generate_latex(self) -> str:
        rows = [
            "\\begin{tabular}{llrrr}",
            "\\hline",
            "Level & Optimisation & Batch & FPS & P95 (ms) \\\\",
            "\\hline",
        ]
        for spec in self.levels:
            if spec.name not in self.results:
                continue
            s = self.results[spec.name]
            rows.append(
                f"{spec.name} & {spec.description} & {s['batch']} & "
                f"{s['fps']:.1f} & {s['p95']:.1f} \\\\"
            )
        rows += ["\\hline", "\\end{tabular}"]
        return "\n".join(rows)


def main(argv=None) -> int:  # pragma: no cover - exercised on hardware
    import argparse

    p = argparse.ArgumentParser(description="TPU optimisation-ladder experiment")
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--levels", type=int, default=None, help="run first N levels")
    p.add_argument("--output", default=None, help="write CSV report here")
    args = p.parse_args(argv)

    exp = OptimizationExperiment(
        levels=LEVELS[: args.levels] if args.levels else None
    )
    exp.run_all_levels(warmup=args.warmup, iterations=args.iterations)
    report = exp.generate_comparison_report()
    print(report)
    if args.output:
        with open(args.output, "w") as f:
            f.write(report + "\n")
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main())
