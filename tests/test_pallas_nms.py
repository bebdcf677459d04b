"""Pallas NMS kernel (interpreter mode on CPU) vs the exact numpy oracle."""

import numpy as np
import pytest

from litepi_tpu.ops.nms import nms_numpy_reference
from litepi_tpu.ops.pallas_nms import pallas_suppress

K = 128  # lane-aligned candidate budget


def _sorted_dets(rng, n_real, num_classes=1):
    x1 = rng.uniform(0, 500, n_real)
    y1 = rng.uniform(0, 500, n_real)
    w = rng.uniform(8, 200, n_real)
    h = rng.uniform(8, 200, n_real)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.3, 1.0, n_real).astype(np.float32))[::-1]
    cls = rng.integers(0, num_classes, n_real).astype(np.int32)
    # pad to K
    pad = K - n_real
    boxes = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    scores = np.concatenate([scores, np.zeros(pad, np.float32)])
    cls = np.concatenate([cls, np.zeros(pad, np.int32)])
    valid = np.arange(K) < n_real
    return boxes, scores, cls, valid


def _oracle_keep(boxes, scores, cls, valid, thr):
    keep = np.zeros(K, bool)
    idx = np.nonzero(valid)[0]
    for c in np.unique(cls[idx]):
        sel = idx[cls[idx] == c]
        kept = nms_numpy_reference(boxes[sel], scores[sel], thr)
        keep[sel[kept]] = True
    return keep


@pytest.mark.parametrize("num_classes", [1, 3, 91])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_kernel_matches_oracle(seed, num_classes):
    rng = np.random.default_rng(seed)
    boxes, scores, cls, valid = _sorted_dets(rng, 90, num_classes)

    got = np.asarray(
        pallas_suppress(
            boxes.T[None],
            cls.astype(np.float32)[None, None, :],
            valid[None],
            0.45,
            True,  # interpret mode
        )
    )[0]
    want = _oracle_keep(boxes, scores, cls, valid, 0.45)
    np.testing.assert_array_equal(got, want)


def test_kernel_batched():
    rng = np.random.default_rng(9)
    planar, clss, valids, wants = [], [], [], []
    for _ in range(4):
        boxes, scores, cls, valid = _sorted_dets(rng, 70)
        planar.append(boxes.T)
        clss.append(cls.astype(np.float32)[None, :])
        valids.append(valid)
        wants.append(_oracle_keep(boxes, scores, cls, valid, 0.5))
    got = np.asarray(
        pallas_suppress(
            np.stack(planar), np.stack(clss), np.stack(valids), 0.5, True
        )
    )
    np.testing.assert_array_equal(got, np.stack(wants))


def test_all_invalid_keeps_nothing():
    boxes = np.zeros((1, 4, K), np.float32)
    cls = np.zeros((1, 1, K), np.float32)
    valid = np.zeros((1, K), bool)
    got = np.asarray(pallas_suppress(boxes, cls, valid, 0.45, True))
    assert not got.any()


def test_large_candidate_budget_shrinks_block():
    """K=512 must pick a small per-instance image block (8 images/block
    OOMs the 16 MB scoped VMEM on real chips — measured 20.16 MB) and
    still match the oracle in interpreter mode."""
    import jax.numpy as jnp

    from litepi_tpu.ops.nms import nms_numpy_reference
    from litepi_tpu.ops.pallas_nms import pallas_suppress

    rng = np.random.default_rng(5)
    b, k = 3, 512
    boxes = rng.uniform(0, 600, (b, k, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 60, (b, k, 2))
    scores = np.sort(rng.random((b, k)).astype(np.float32))[:, ::-1].copy()
    valid = scores > 0.3
    keep = np.asarray(
        pallas_suppress(
            jnp.swapaxes(jnp.asarray(boxes), -1, -2),
            jnp.zeros((b, 1, k), jnp.float32),
            jnp.asarray(valid),
            0.45,
            interpret=True,
        )
    )
    for i in range(b):
        n = int(valid[i].sum())
        ref = nms_numpy_reference(boxes[i, :n], scores[i, :n], 0.45)
        got = np.where(keep[i, :n])[0]
        np.testing.assert_array_equal(np.sort(ref), np.sort(got))
