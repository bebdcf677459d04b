"""Multi-host (DCN) distributed input pipeline.

The reference is single-process (SURVEY §2.4); its loader feeds one device.
On a multi-host TPU pod each process sees only its local chips, so the input
pipeline must (a) partition the dataset across processes with no overlap and
(b) assemble per-process host batches into one *global* jax.Array whose batch
dimension is sharded over the mesh's 'data' axis — the layout the jitted
train/serve step already expects (parallel/mesh.py).  Data never crosses DCN:
each host decodes only the shard its own chips consume;
``jax.make_array_from_process_local_data`` stitches the global view.

Single-process (including the virtual 8-device CPU mesh used in tests) is the
degenerate case of the same code path, so the whole flow is testable without
a pod.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_paths(
    paths: Sequence,
    index: Optional[int] = None,
    count: Optional[int] = None,
) -> List:
    """Deterministic per-process dataset shard: strided ``paths[index::count]``.

    Strided (not contiguous) so sorted-by-name datasets spread any ordering
    bias (e.g. per-class file prefixes) evenly across hosts.  Defaults to
    this process's ``jax.process_index()`` / ``jax.process_count()``.
    """
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if not 0 <= index < count:
        raise ValueError(f"process index {index} out of range for {count}")
    return list(paths)[index::count]


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def make_global_batch(mesh: Mesh, local_batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Assemble per-process host arrays into globally batch-sharded jax.Arrays.

    ``local_batch``: pytree of arrays whose leading dim is the PER-PROCESS
    batch; the returned arrays have global leading dim
    ``local * jax.process_count()``, sharded over the mesh's 'data' axis.
    Every process must call this collectively with same-shaped locals.
    """
    sharding = global_batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_batch,
    )


def distribute_batches(
    mesh: Mesh, batches: Iterator[Dict[str, np.ndarray]]
) -> Iterator[Dict[str, Any]]:
    """Lift a host batch iterator (e.g. ``DetectionDataset.batches``) into
    globally sharded device batches for the jitted step."""
    for batch in batches:
        yield make_global_batch(mesh, batch)
