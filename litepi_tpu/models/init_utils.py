"""Fast parameter initialisation.

Initialising by tracing a full-resolution forward is expensive (a 640x640
float32 trace costs ~40 s on host, ~150 s through a remote-compile TPU
plugin).  Every model in this framework is fully convolutional up to a
global mean-pool, so parameter and batch-stat shapes are independent of the
spatial input size: initialise at a tiny spatial size on the host CPU and
the variables are bit-identical to a full-size init.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from flax import linen as nn


def fast_init(
    model: nn.Module,
    seed: int = 0,
    spatial: int = 64,
    channels: int = 3,
) -> Any:
    """Initialise ``model`` variables on the host CPU at a small spatial size.

    ``spatial`` must cover the model's total stride (64 >= the detector's 32).
    """
    x = np.zeros((1, spatial, spatial, channels), np.float32)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # jit rather than eager-trace: eager init dispatches each op as its
        # own tiny executable (~60-100 s for the two-stage pair on a 1-core
        # host), while one jitted program compiles once and — because the
        # CPU backend honours JAX_COMPILATION_CACHE_DIR — later *processes*
        # load it from the persistent cache in ~a second.  Keyed by the
        # traced program, so any model-code change re-inits correctly.
        init = jax.jit(lambda key: model.init(key, x, train=False))
        return jax.device_get(init(jax.random.key(seed)))
