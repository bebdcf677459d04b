"""Hardware/environment report (the reference dumps its benchmark
environment — evaluation-tsr.ipynb cell 20: CPU model, RAM, library
versions).  TPU equivalent: device kind/count, platform versions, host."""

from __future__ import annotations

import json
import platform
import sys
from typing import Dict


def environment_report() -> Dict[str, object]:
    import jax

    out: Dict[str, object] = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "processor": platform.processor() or "unknown",
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_count": jax.device_count(),
    }
    try:
        import flax

        out["flax"] = flax.__version__
    except ImportError:  # pragma: no cover
        pass
    try:
        import psutil

        out["ram_gb"] = round(psutil.virtual_memory().total / 2**30, 1)
        out["cpus"] = psutil.cpu_count()
    except ImportError:  # pragma: no cover
        pass
    try:
        from litepi_tpu.data import native_loader

        out["native_loader"] = native_loader.available()
    except ImportError:  # pragma: no cover
        pass
    return out


def main() -> int:
    print(json.dumps(environment_report(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
