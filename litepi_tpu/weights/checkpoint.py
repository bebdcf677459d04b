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


def save_checkpoint(path: str, variables: Any) -> None:
    """Save a pytree of arrays to ``path`` (a directory)."""
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

    meta_arrays = {k: np.asarray(v) for k, v in meta.items()}
    save_checkpoint(path, {"state": jax.device_get(state), "meta": meta_arrays})


def load_train_checkpoint(path: str, like_state: Any) -> tuple:
    """Restore (state, meta) saved by :func:`save_train_checkpoint`.

    ``like_state`` is a freshly constructed train state of the same topology
    (same model/optimizer config) — it anchors pytree structure and dtypes so
    the restore returns the typed dataclass, not a raw dict.
    """
    import numpy as np

    restored = load_checkpoint(path)
    tpl = {"state": like_state, "meta": restored["meta"]}
    typed = load_checkpoint(path, like=tpl)
    meta = {k: np.asarray(v).item() for k, v in typed["meta"].items()}
    return typed["state"], meta
