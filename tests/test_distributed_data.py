"""Distributed input pipeline: per-process dataset sharding + global batch
assembly (data/distributed.py), exercised single-process on the virtual
8-device CPU mesh (conftest.py) — the degenerate case of the same code path
a multi-host pod runs."""

import jax
import numpy as np
import pytest

from litepi_tpu.data.distributed import (
    distribute_batches,
    make_global_batch,
    shard_paths,
)
from litepi_tpu.parallel import make_mesh


def test_shard_paths_disjoint_covering_deterministic():
    paths = [f"im{i:03d}.jpg" for i in range(23)]
    shards = [shard_paths(paths, i, 4) for i in range(4)]
    flat = [p for s in shards for p in s]
    assert sorted(flat) == sorted(paths)  # covering, no overlap
    assert len(set(flat)) == len(paths)
    # strided: shard i gets paths[i::4]
    assert shards[1] == paths[1::4]
    # deterministic
    assert shards[2] == shard_paths(paths, 2, 4)
    with pytest.raises(ValueError):
        shard_paths(paths, 4, 4)


def test_shard_paths_defaults_to_this_process():
    paths = list(range(10))
    assert shard_paths(paths) == paths  # single process: identity


def test_make_global_batch_shards_over_data_axis():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    local = {
        "images": rng.normal(size=(16, 8, 8, 3)).astype(np.float32),
        "gt_mask": rng.uniform(size=(16, 4)) > 0.5,
    }
    glob = make_global_batch(mesh, local)
    for k, v in glob.items():
        assert v.shape == local[k].shape  # single process: global == local
        assert v.sharding.spec == jax.sharding.PartitionSpec("data")
        np.testing.assert_array_equal(np.asarray(v), local[k])
    # each device holds 1/8 of the batch
    assert glob["images"].addressable_shards[0].data.shape[0] == 2


@pytest.mark.slow
def test_distribute_batches_feeds_sharded_train_step():
    """The distributed loader's output drives the real sharded train step."""
    import functools

    import jax.numpy as jnp

    from litepi_tpu.core.types import DetectorConfig
    from litepi_tpu.parallel import replicated_sharding
    from litepi_tpu.train.detector import (
        create_detector_train_state,
        detector_train_step,
    )

    mesh = make_mesh(8)
    cfg = DetectorConfig(
        name="tiny", base_channels=(8, 16, 32, 64, 128), input_size=64
    )
    model, state, tx = create_detector_train_state(cfg, dtype=jnp.float32)
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = jax.jit(functools.partial(detector_train_step, model, tx))

    rng = np.random.default_rng(0)

    def host_batches():
        for _ in range(2):
            yield {
                "images": rng.uniform(size=(8, 64, 64, 3)).astype(np.float32),
                "gt_boxes": np.tile(
                    np.asarray([[10, 10, 30, 30]], np.float32), (8, 4, 1)
                ),
                "gt_labels": np.zeros((8, 4), np.int32),
                "gt_mask": np.ones((8, 4), bool),
            }

    losses = []
    for batch in distribute_batches(mesh, host_batches()):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert len(losses) == 2 and all(np.isfinite(losses))
