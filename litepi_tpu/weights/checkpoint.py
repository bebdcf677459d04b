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
