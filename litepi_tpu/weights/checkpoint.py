"""Orbax checkpointing for converted / trained parameters.

The reference's only checkpoint notion is torch ``.pth`` best-val saves during
training (reference: train-model-tsr-tt100k.ipynb cell 23) and append-on-rerun
CSVs (e2e.py:1180-1185).  Here converted and trained pytrees persist through
orbax so every entry point (CLI, bench, tests) restores identical variables.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _sync(name: str) -> None:
    """Global barrier; no-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def save_checkpoint(path: str, variables: Any) -> None:
    """Save a pytree of arrays to ``path`` (a directory).

    Multi-host: EVERY process must call this (orbax's save is a collective —
    it runs internal cross-process syncs, so a process-0-only call leaves the
    others' collective streams misaligned and the next barrier dies on a
    name mismatch; found by the 2-process dryrun).  Orbax's primary-host
    logic ensures replicated/host data is written once.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Any = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``like`` (optional) is an abstract target pytree used to restore with
    matching shardings/dtypes; without it arrays restore to host defaults.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def save_train_checkpoint(path: str, state: Any, meta: dict) -> None:
    """Persist a FULL training state (params, EMA, optimizer moments, step)
    plus loop metadata (epoch cursor, best score) for exact resumption.

    The reference has no training-resume notion (its notebooks restart from
    scratch); this closes that gap for long TPU runs where preemption is
    routine.  ``meta`` values must be scalars (saved as 0-d arrays).
    """
    import numpy as np

    import shutil

    meta_arrays = {k: np.asarray(v) for k, v in meta.items()}
    payload = {"state": jax.device_get(state), "meta": meta_arrays}
    # crash-safe swap: the previous resume point must survive until the new
    # one is fully written (a force-overwrite deletes it FIRST, so a
    # preemption mid-save would destroy the only resume point — the exact
    # event resume exists for).  Multi-host: filesystem mutations are
    # process-0-only on the shared checkpoint FS, the orbax write is
    # collective (see save_checkpoint), and barriers order the two so no
    # process writes into a directory mid-rmtree or reads a half-swapped
    # path.
    path = os.path.abspath(path)
    new, old = path + ".new", path + ".old"
    if jax.process_index() == 0:
        for stale in (new, old):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
    _sync("litepi_ckpt_clean")
    save_checkpoint(new, payload)
    if jax.process_index() == 0:
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(new, path)
        if os.path.isdir(old):
            shutil.rmtree(old)
    _sync("litepi_ckpt_swap")


def load_train_checkpoint(
    path: str, like_state: Any, meta_template: dict = None
) -> tuple:
    """Restore (state, meta) saved by :func:`save_train_checkpoint`.

    ``like_state`` is a freshly constructed train state of the same topology
    (same model/optimizer config) — it anchors pytree structure and dtypes so
    the restore returns the typed dataclass, not a raw dict.
    ``meta_template`` (e.g. ``{"next_epoch": 0, "best_score": 0.0}``) lets
    the restore happen in ONE pass; without it the checkpoint is read twice
    (once untyped just to learn meta's keys).  If ``path`` is missing but a
    ``path + ".old"`` swap leftover exists (preemption between the renames
    of :func:`save_train_checkpoint`), it is PROMOTED back to ``path``
    before restoring — otherwise the next epoch's save would delete the
    sole surviving resume point as "stale" before its replacement exists,
    reopening the data-loss window the swap closes.  Multi-host: only
    process 0 renames, and every process waits on a global barrier before
    reading, so no process can race the rename (requires the shared
    checkpoint filesystem the train CLI's resume-epoch agreement check
    already enforces).
    """
    import numpy as np

    abspath = os.path.abspath(path)
    if jax.process_index() == 0 and (
        not os.path.isdir(abspath) and os.path.isdir(abspath + ".old")
    ):
        os.rename(abspath + ".old", abspath)
    _sync("litepi_resume_promote")
    if meta_template is not None:
        tpl = {
            "state": like_state,
            "meta": {k: np.asarray(v) for k, v in meta_template.items()},
        }
        typed = load_checkpoint(path, like=tpl)
    else:
        restored = load_checkpoint(path)
        tpl = {"state": like_state, "meta": restored["meta"]}
        typed = load_checkpoint(path, like=tpl)
    meta = {k: np.asarray(v).item() for k, v in typed["meta"].items()}
    return typed["state"], meta
