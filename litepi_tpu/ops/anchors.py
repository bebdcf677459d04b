"""Static anchor-point / stride tables for the anchor-free detector head.

The exported reference graph bakes its anchor grid into constants: 8,400
positions = 80^2 + 40^2 + 20^2 cells at strides 8/16/32, each anchored at the
cell centre (+0.5 offset) (reference: model.ncnn.param:184-195, the
anchor-add / stride-mul layers).  Because the input size is static, the table
is a compile-time constant folded into the jitted program.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def make_anchors(
    input_size: int = 640,
    strides: Sequence[int] = (8, 16, 32),
    cell_offset: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (anchor_points, stride_per_anchor).

    Returns
    -------
    anchor_points : (A, 2) float32 — (x, y) cell-centre coordinates in
        feature-map units, per level, concatenated P3..P5.
    strides_arr : (A, 1) float32 — the stride of each anchor's level.

    A = sum((input_size // s)^2) = 8,400 at 640.
    """
    points, strides_out = [], []
    for s in strides:
        n = input_size // s
        xs = np.arange(n, dtype=np.float32) + cell_offset
        ys = np.arange(n, dtype=np.float32) + cell_offset
        gx, gy = np.meshgrid(xs, ys)
        points.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strides_out.append(np.full((n * n, 1), float(s), dtype=np.float32))
    return (
        np.concatenate(points, axis=0),
        np.concatenate(strides_out, axis=0),
    )
