"""Multi-chip serving: the fused two-stage program sharded over a device mesh.

The reference serves on exactly one device (a Pi CPU); its only scale lever
is threads (SURVEY §2.4).  Here the scale-out dimension is **batch over the
mesh's data axis**: parameters are replicated, frames are batch-sharded, and
because the fused program has no cross-frame dataflow, XLA partitions it into
pure SPMD with zero collectives in the forward path — throughput scales
linearly over ICI-connected chips.

Usage::

    mesh = make_mesh()                      # all visible chips
    server = MeshServer(pipe, mesh)
    out = server.serve(frames)              # (B, ...) padded outputs

``serve`` accepts any batch divisible by the data-axis size.  The same
``TwoStagePipeline._fused_jit`` program is reused — sharded inputs alone turn
it into a multi-chip program.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from litepi_tpu.parallel.mesh import (
    batch_sharding,
    put_replicated,
    replicated_sharding,
)
from litepi_tpu.pipeline.two_stage import TwoStagePipeline


class MeshServer:
    def __init__(self, pipe: TwoStagePipeline, mesh: Mesh) -> None:
        self.pipe = pipe
        self.mesh = mesh
        self._param_sharding = replicated_sharding(mesh)
        self._batch_sharding = batch_sharding(mesh)
        # place parameters once, replicated across the mesh (multi-process
        # safe: put_replicated routes around the cross-host reshard ban)
        self.det_vars = put_replicated(pipe.det_vars, mesh)
        self.cls_vars = put_replicated(pipe.cls_vars, mesh)

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    def serve(
        self,
        frames: np.ndarray,
        conf_threshold: Optional[float] = None,
        area_scale: Optional[np.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Run the fused program with the batch sharded over the data axis.

        frames: (B, H, W, 3) uint8 with B % data_parallelism == 0.
        area_scale: optional (B,) per-frame box-area rescale for the
        min-area floor (the native pre-letterboxed feed passes 1/ratio^2 —
        see TwoStagePipeline.run_fused); sharded alongside the batch.
        """
        n = self.data_parallelism
        if frames.shape[0] % n:
            raise ValueError(
                f"batch {frames.shape[0]} not divisible by data axis {n}"
            )
        conf = (
            self.pipe.cfg.benchmark_conf
            if conf_threshold is None
            else conf_threshold
        )
        frames = jax.device_put(frames, self._batch_sharding)
        if area_scale is not None:
            area_scale = jax.device_put(
                np.asarray(area_scale, np.float32), self._batch_sharding
            )
        return self._run(frames, conf, area_scale)

    def serve_local(
        self, local_frames: np.ndarray, conf_threshold: Optional[float] = None
    ) -> Dict[str, jnp.ndarray]:
        """Multi-process serving: ``local_frames`` is THIS process's shard.

        Each host feeds only the frames its own chips consume (the pod input
        contract of :mod:`litepi_tpu.data.distributed`); the global batch is
        ``local * process_count``, assembled without any cross-host frame
        traffic.  Single-process this is exactly :meth:`serve`.  Returned
        arrays are globally sharded — gather with
        ``multihost_utils.process_allgather`` if a host needs foreign rows.
        """
        conf = (
            self.pipe.cfg.benchmark_conf
            if conf_threshold is None
            else conf_threshold
        )
        frames = jax.make_array_from_process_local_data(
            self._batch_sharding, np.asarray(local_frames)
        )
        return self._run(frames, conf)

    def _run(
        self, frames, conf: float, area_scale=None
    ) -> Dict[str, jnp.ndarray]:
        hw = (int(frames.shape[1]), int(frames.shape[2]))
        return self.pipe._fused_jit(
            self.det_vars, self.cls_vars, hw, jnp.float32(conf), frames,
            area_scale,
        )
