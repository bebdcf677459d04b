"""Multi-PROCESS mesh dryrun: 2 hosts x N local devices over jax.distributed.

``__graft_entry__.dryrun_multichip`` certifies the sharded train/serve
programs on a single-process virtual mesh; everything DCN-shaped —
``jax.distributed`` bring-up, per-process dataset sharding
(:func:`litepi_tpu.data.distributed.shard_paths`), global-batch assembly
from process-local host arrays, the multi-host resume-promotion barrier in
:mod:`litepi_tpu.weights.checkpoint` — only exercises its real code path
when ``jax.process_count() > 1``.  This module runs that path for real:
it spawns worker processes (CPU platform, gloo collectives), each owning
``devices_per_process`` virtual devices of one shared mesh, runs

1. ``shard_paths`` disjointness/completeness over an odd-sized dataset,
2. one detector train step on a ``make_global_batch``-assembled batch,
3. fused two-stage serving through ``MeshServer`` on a process-local feed,
4. ``save_train_checkpoint`` -> crash-swap ``.old`` promotion ->
   ``load_train_checkpoint`` under the multi-host barrier,

and asserts parity with the same flow run single-process over the same
2N-device mesh.  Served outputs must be BIT-IDENTICAL (per-frame compute,
no cross-device reduction).  The train loss and post-step parameter
checksum flow through gradient all-reduces, whose summation ORDER is a
topology choice (one flat 8-way reduce vs hierarchical 4-way + gloo
cross-host) — observed skew ~6e-9 relative — so they are held to a 1e-6
relative tolerance instead: tight enough to catch a wrong collective,
honest about float addition being non-associative.

The reference is single-process (SURVEY §2.4); this subsystem exists for
TPU pods, where every training job is multi-process by construction.
"""

from __future__ import annotations

import json
import math
import os
import socket
import subprocess
import sys
import tempfile
from typing import Dict


_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_flow(shared_dir: str) -> Dict[str, float]:
    """The flow under test; runs identically single- and multi-process.

    Assumes jax is initialised (platform/devices/distributed already set
    up by :func:`worker_main` or the caller).  Returns the scalars compared
    across process topologies (serve_* bitwise, reduced scalars at 1e-6
    relative — see the module docstring).
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from litepi_tpu.core.types import DetectorConfig, NMSConfig, PipelineConfig
    from litepi_tpu.data.distributed import make_global_batch, shard_paths
    from litepi_tpu.parallel.mesh import make_mesh, put_replicated
    from litepi_tpu.pipeline import TwoStagePipeline
    from litepi_tpu.pipeline.serving import MeshServer
    from litepi_tpu.train.detector import (
        create_detector_train_state,
        detector_train_step,
    )
    from litepi_tpu.weights.checkpoint import (
        load_train_checkpoint,
        save_train_checkpoint,
    )

    pid, pcount = jax.process_index(), jax.process_count()
    devices = jax.devices()
    mesh = make_mesh(len(devices), devices=devices)
    n_global = len(devices)

    def barrier(name: str, timeout_ms: int = 1_200_000) -> None:
        """Coordination-service barrier (NOT a gloo collective).

        XLA:CPU creates a fresh gloo communicator clique per executable and
        bounds its key exchange at ~30 s, so if one process reaches a
        program's first collective while a peer is still COMPILING it (real
        on a contended 1-core host: the skew can be minutes, e.g. when one
        process hits the persistent compilation cache and the other
        doesn't), the clique times out and the job dies.  Compile-heavy
        programs are therefore AOT-compiled first, then everyone meets
        here, then execution starts with bounded skew.
        """
        if pcount == 1:
            return
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_in_ms=timeout_ms)

    # -- 1. dataset sharding: strided shards partition an odd-sized set --
    paths = [f"img_{i:03d}.jpg" for i in range(19)]
    local_paths = shard_paths(paths)
    owned = np.isin(np.arange(len(paths)), [int(p[4:7]) for p in local_paths])
    coverage = multihost_utils.process_allgather(
        owned.astype(np.int32)[None], tiled=True
    ).sum(axis=0)
    if not (coverage == 1).all():
        raise RuntimeError(f"shard_paths overlap/gap: coverage={coverage}")

    # -- 2. one train step on a globally assembled batch ------------------
    cfg = DetectorConfig(
        name="dryrun_tiny", base_channels=(32, 64, 128, 256, 512), input_size=64
    )
    model, state, tx = create_detector_train_state(cfg, dtype=jnp.float32)
    state = put_replicated(state, mesh)

    rng = np.random.default_rng(0)
    b, g = n_global, 4
    full_batch = {
        "images": rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32),
        "gt_boxes": np.tile(
            np.asarray([8.0, 8.0, 40.0, 40.0], np.float32), (b, g, 1)
        ),
        "gt_labels": np.zeros((b, g), np.int32),
        "gt_mask": np.ones((b, g), bool),
    }
    per = b // pcount
    local_batch = jax.tree.map(
        lambda x: x[pid * per : (pid + 1) * per], full_batch
    )
    batch = make_global_batch(mesh, local_batch)
    step = jax.jit(functools.partial(detector_train_step, model, tx))
    compiled_step = step.lower(state, batch).compile()
    barrier("train_step_compiled")
    new_state, metrics = compiled_step(state, batch)
    jax.block_until_ready(new_state)
    loss = float(metrics["loss"])
    # params are replicated -> every process reads the full value locally
    param_sum = float(
        sum(
            float(jnp.abs(leaf).sum())
            for leaf in jax.tree.leaves(new_state.params)
        )
    )

    # -- 3. fused serving on a process-local frame feed -------------------
    pcfg = PipelineConfig(
        detector=cfg,
        nms=NMSConfig(max_candidates=64, max_detections=8),
        det_input_size=64,
        cls_input_size=32,
        num_classifier_classes=7,
    )
    pipe = TwoStagePipeline.initialize(pcfg, seed=0, dtype=jnp.float32)
    frames_full = rng.integers(0, 256, (2 * n_global, 64, 64, 3), np.uint8)
    fper = frames_full.shape[0] // pcount
    server = MeshServer(pipe, mesh)
    local_frames = frames_full[pid * fper : (pid + 1) * fper]
    # AOT-warm the fused program (persists to the shared compilation cache),
    # then align, then serve — serve_local's own jit re-trace loads the
    # cached executable so execution starts with bounded cross-process skew
    frames_global = jax.make_array_from_process_local_data(
        server._batch_sharding, np.asarray(local_frames)
    )
    # (.lower on the jitted method does not bind self — pass it explicitly)
    pipe._fused_jit.lower(
        pipe,
        server.det_vars,
        server.cls_vars,
        (64, 64),
        jnp.float32(0.01),
        frames_global,
    ).compile()
    barrier("serve_compiled")
    served = server.serve_local(local_frames, conf_threshold=0.01)
    gathered = {
        k: multihost_utils.process_allgather(served[k], tiled=True)
        for k in ("boxes", "det_scores", "cls_labels", "valid")
    }
    serve_sums = {
        k: float(np.asarray(v, np.float64).sum()) for k, v in gathered.items()
    }

    # -- 4. resume promotion under the multi-host barrier ------------------
    ck = os.path.join(shared_dir, "resume")
    save_train_checkpoint(ck, new_state, {"next_epoch": 3, "best_score": 0.5})
    if pid == 0:  # simulate preemption between the two renames of the swap
        os.rename(ck, ck + ".old")
    multihost_utils.sync_global_devices("litepi_mp_dryrun_preempt")
    restored, meta = load_train_checkpoint(
        ck, state, {"next_epoch": 0, "best_score": 0.0}
    )
    if meta["next_epoch"] != 3:
        raise RuntimeError(f"resume meta lost: {meta}")
    restored_sum = float(
        sum(
            float(jnp.abs(leaf).sum())
            for leaf in jax.tree.leaves(restored.params)
        )
    )
    if restored_sum != param_sum:
        raise RuntimeError(
            f"restored params diverge: {restored_sum} != {param_sum}"
        )

    return {
        "processes": pcount,
        "devices": n_global,
        "loss": loss,
        "param_sum": param_sum,
        **{f"serve_{k}": v for k, v in serve_sums.items()},
    }


def worker_main(argv=None) -> int:
    """Entry point for one spawned process (also the 1-process reference)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--shared-dir", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    # the TPU-relay sitecustomize hook force-sets JAX_PLATFORMS; config
    # wins over the env var (same workaround as __graft_entry__)
    jax.config.update("jax_platforms", "cpu")
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    result = _worker_flow(args.shared_dir)
    if args.process_id == 0 or args.num_processes == 1:
        with open(args.out, "w") as f:
            json.dump(result, f)
    return 0


def run_multiprocess_dryrun(
    num_processes: int = 2,
    devices_per_process: int = 4,
    timeout: float = 900.0,
) -> Dict[str, float]:
    """Spawn the flow at 1 process and at ``num_processes`` over the SAME
    global device count and assert bit-identical results.  Returns the
    multi-process result dict (raises on any divergence)."""
    n_global = num_processes * devices_per_process

    def spawn(nproc: int, dev_per: int, tag: str, tmp: str):
        port = _free_port()
        outs, procs = [], []
        for pid in range(nproc):
            out = os.path.join(tmp, f"{tag}_p{pid}.json")
            outs.append(out)
            env = dict(
                os.environ,
                JAX_PLATFORMS="cpu",
                XLA_FLAGS=f"--xla_force_host_platform_device_count={dev_per}",
            )
            # the single- and multi-process spawns compile identical SPMD
            # programs (same global mesh); a persistent shared cache makes
            # the second spawn ~free AND lets the driver's dryrun reuse what
            # the slow-lane test already compiled on this host
            env.setdefault(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/litepi_tpu/jaxcache-mp"),
            )
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        "-m",
                        "litepi_tpu.parallel.multiprocess",
                        "--process-id",
                        str(pid),
                        "--num-processes",
                        str(nproc),
                        "--port",
                        str(port),
                        "--shared-dir",
                        os.path.join(tmp, tag),
                        "--out",
                        out,
                    ],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                    env=env,
                    cwd=_REPO_ROOT,
                )
            )
        logs = []
        for p in procs:
            try:
                log, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(log)
        for pid, (p, log) in enumerate(zip(procs, logs)):
            if p.returncode != 0:
                raise RuntimeError(
                    f"{tag} process {pid} failed (rc={p.returncode}):\n"
                    + log[-4000:]
                )
        with open(outs[0]) as f:
            return json.load(f)

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "single"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "multi"), exist_ok=True)
        single = spawn(1, n_global, "single", tmp)
        multi = spawn(num_processes, devices_per_process, "multi", tmp)

    def agrees(k: str) -> bool:
        if k in ("loss", "param_sum"):
            # crosses a gradient all-reduce: reduction order is a topology
            # choice, bit-equality is not a meaningful contract (see module
            # docstring) — 1e-6 relative still catches a wrong collective
            return math.isclose(single[k], multi[k], rel_tol=1e-6)
        return single[k] == multi[k]

    mismatches = {
        k: (single[k], multi[k])
        for k in single
        if k != "processes" and not agrees(k)
    }
    if mismatches:
        raise RuntimeError(
            f"multi-process results diverge from single-process: {mismatches}"
        )
    return multi


if __name__ == "__main__":
    sys.exit(worker_main())
