"""Per-stage timing and pipeline metrics.

The reference wraps every pipeline stage in wall-clock timers and collects
them into a ``PipelineMetrics`` dataclass (reference: e2e.py:34-62, populated
at :451-506), plus psutil CPU / RSS and SoC temperature probes (:509-516).

On TPU the analogue is device-time measurement: a jitted program runs
asynchronously, so a stage timer must block on the stage's outputs
(``block_until_ready``) to observe real device latency.  ``StageTimer`` does
exactly that, and ``PipelineMetrics`` keeps the same field surface as the
reference so CSV schemas stay compatible.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


@dataclasses.dataclass
class PipelineMetrics:
    """Per-frame (or per-batch) stage timings, in milliseconds.

    Field names follow the reference dataclass (e2e.py:34-62) so downstream
    CSV/reporting code is drop-in compatible.
    """

    t_detection: float = 0.0
    t_roi_extract: float = 0.0
    t_classification: float = 0.0
    t_postprocess: float = 0.0
    t_total: float = 0.0
    fps: float = 0.0
    num_detections: int = 0
    cpu_percent: float = 0.0
    memory_mb: float = 0.0
    temperature_c: Optional[float] = None

    def as_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


class StageTimer:
    """Wall-clock stage timer that forces device completion.

    Usage::

        timer = StageTimer()
        with timer.stage("detection"):
            out = detect_fn(x)
            timer.sync(out)          # block on device outputs inside the stage
        ms = timer.times_ms["detection"]
    """

    def __init__(self) -> None:
        self.times_ms: Dict[str, float] = {}

    class _Ctx:
        def __init__(self, timer: "StageTimer", name: str) -> None:
            self._timer = timer
            self._name = name

        def __enter__(self) -> "StageTimer._Ctx":
            self._t0 = time.perf_counter()
            return self

        def __exit__(self, *exc) -> None:
            dt = (time.perf_counter() - self._t0) * 1e3
            self._timer.times_ms[self._name] = (
                self._timer.times_ms.get(self._name, 0.0) + dt
            )

    def stage(self, name: str) -> "StageTimer._Ctx":
        return StageTimer._Ctx(self, name)

    @staticmethod
    def sync(tree: Any) -> Any:
        """Block until every array in ``tree`` is computed on device."""
        return jax.block_until_ready(tree)


def percentile_summary(latencies_ms: List[float]) -> Dict[str, float]:
    """P50/P95/P99 latency summary, as the reference prints per optimisation
    level (reference: runner.py:885-887)."""
    arr = np.asarray(latencies_ms, dtype=np.float64)
    if arr.size == 0:
        return {"p50": 0.0, "p95": 0.0, "p99": 0.0, "mean": 0.0}
    return {
        "p50": float(np.percentile(arr, 50)),
        "p95": float(np.percentile(arr, 95)),
        "p99": float(np.percentile(arr, 99)),
        "mean": float(arr.mean()),
    }


def read_host_counters() -> Dict[str, float]:
    """CPU%, RSS MB and (when exposed) SoC temperature, mirroring the
    reference's psutil + /sys/class/thermal probes (e2e.py:509-516)."""
    out: Dict[str, float] = {}
    try:
        import psutil

        proc = psutil.Process()
        out["cpu_percent"] = psutil.cpu_percent(interval=None)
        out["memory_mb"] = proc.memory_info().rss / (1024 * 1024)
    except Exception:  # pragma: no cover - psutil always present in image
        pass
    try:
        with open("/sys/class/thermal/thermal_zone0/temp") as f:
            out["temperature_c"] = int(f.read().strip()) / 1000.0
    except Exception:
        pass
    return out
