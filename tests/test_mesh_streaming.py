"""Mesh x streaming composition (VERDICT r4 'next #7'): the decode-ahead
window feeding the SHARDED fused program — the pod-serving shape, where
per-host decode pools stream JPEG batches into a data-parallel mesh.

MeshServer is parity-tested on static frames (test_serving.py) and
StreamingRunner on a single device (test_streaming.py); this composes them:
the same JPEG paths through StreamingRunner(server=MeshServer(...)) on the
8-device CPU mesh must reproduce the single-device streaming run — same
ordering/padding contract, near-identical boxes in original pixel space —
with outputs actually sharded across the mesh at dispatch, and the
cls_crop_budget's batch-global top-k collective exercised under sharding.
"""

import dataclasses

import numpy as np
import pytest

from litepi_tpu.core.types import DetectorConfig, NMSConfig, PipelineConfig
from litepi_tpu.parallel import make_mesh
from litepi_tpu.pipeline import TwoStagePipeline
from litepi_tpu.pipeline.serving import MeshServer
from litepi_tpu.pipeline.streaming import StreamingRunner

SMALL = PipelineConfig(
    detector=DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=160
    ),
    nms=NMSConfig(max_candidates=64, max_detections=8, min_area=1.0),
    num_classifier_classes=4,
    det_input_size=160,
    # serving budgets ON: the cls compaction is a batch-global top-k —
    # a cross-device collective under data sharding, exactly what this
    # composition needs to prove out
    crop_det_budget=4,
    cls_crop_budget=16,
)


@pytest.fixture(scope="module")
def pipe():
    return TwoStagePipeline.initialize(SMALL, seed=0)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("mesh_stream")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(20):
        img = rng.integers(0, 200, (120, 200, 3), dtype=np.uint8)
        p = str(root / f"f{i:03d}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


@pytest.mark.slow
def test_streaming_through_mesh_matches_single_device(pipe, jpeg_dir):
    mesh = make_mesh(8, backend="cpu")
    server = MeshServer(pipe, mesh)

    single = StreamingRunner(pipe, batch_size=8, inflight=2)
    meshed = StreamingRunner(pipe, batch_size=8, inflight=2, server=server)

    got_s = list(single.run(jpeg_dir, conf_threshold=0.05))
    got_m = list(meshed.run(jpeg_dir, conf_threshold=0.05))
    single.close()
    meshed.close()

    # same ordering/padding contract (trailing batch: 4 of 8 real)
    assert [p for ps, _ in got_s for p in ps] == list(jpeg_dir)
    assert [p for ps, _ in got_m for p in ps] == list(jpeg_dir)

    for (_, out_s), (_, out_m) in zip(got_s, got_m):
        vs, vm = np.asarray(out_s["valid"]), np.asarray(out_m["valid"])
        assert vs.sum() == vm.sum()
        # boxes in original pixel space agree across the sharded dispatch
        # (decode/resize identical — same loader; only the device layout
        # differs, so only accumulation-order noise is allowed)
        np.testing.assert_allclose(
            np.asarray(out_s["boxes"], np.float64),
            np.asarray(out_m["boxes"], np.float64),
            atol=1e-3,
        )
        np.testing.assert_array_equal(vs, vm)

    # the budget actually gated something (the collective ran non-trivially)
    total_valid = sum(np.asarray(o["valid"]).sum() for _, o in got_m)
    assert total_valid > 0


def test_mesh_streaming_batch_divisibility(pipe, jpeg_dir):
    mesh = make_mesh(8, backend="cpu")
    server = MeshServer(pipe, mesh)
    runner = StreamingRunner(pipe, batch_size=6, inflight=1, server=server)
    with pytest.raises(ValueError, match="not divisible"):
        list(runner.run(jpeg_dir[:6], conf_threshold=0.05))
    runner.close()
