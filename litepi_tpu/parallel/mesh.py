"""Device mesh and sharding layout for multi-chip serving and training.

The reference is single-process / single-device; its only parallelism is
intra-op CPU threading (SURVEY §2.4 — NCNN ``num_threads``, OpenVINO
``NUM_STREAMS``).  On TPU the scale-out dimension for this workload is
**batch**: a 1.8M-param CNN needs no tensor/pipeline/sequence/expert sharding
(the whole model fits in one core's VMEM working set), so the honest layout is

* ``data`` axis — batch-sharded frames/crops, replicated params.  Gradients
  reduce over ICI via the ``psum`` XLA inserts for the replicated-param /
  sharded-batch layout under ``jit``.
* ``model`` axis — kept in the mesh (size 1 by default) so wider classifier
  heads or future large variants can shard their final projection without
  re-plumbing callers.

Everything goes through ``jax.sharding.NamedSharding`` + ``jit``; XLA chooses
the collectives.  DCN would only appear for multi-host input feeding, which
this framework does host-side per process.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    backend: Optional[str] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``n_devices`` defaults to every visible device; ``backend`` may name a
    platform explicitly (e.g. 'cpu' for the virtual 8-device test mesh while
    a TPU plugin owns the default backend).
    """
    if devices is None:
        devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Full replication (parameters)."""
    return NamedSharding(mesh, P())


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree of host-local values across the whole mesh.

    Single-process this is a plain ``device_put``.  Multi-controller JAX
    rejects ``device_put`` of a locally-committed array onto a sharding that
    spans other hosts' devices (cross-host reshard), so there each process
    contributes its local copy via ``make_array_from_process_local_data``.
    Callers must ensure every process holds IDENTICAL values (deterministic
    init or a prior broadcast) — replication asserts it, it doesn't sync it.
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def shard_pipeline_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a pytree of batch-leading arrays with the batch dim sharded over
    'data'.  Used by the serving path to spread frames across chips."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
