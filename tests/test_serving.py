"""Multi-chip serving: the fused program sharded over the 8-device CPU mesh
must produce results identical to the single-device run."""

import numpy as np
import pytest

from litepi_tpu.core.types import DetectorConfig, NMSConfig, PipelineConfig
from litepi_tpu.parallel import make_mesh
from litepi_tpu.pipeline import TwoStagePipeline
from litepi_tpu.pipeline.serving import MeshServer

SMALL = PipelineConfig(
    detector=DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=160
    ),
    nms=NMSConfig(max_candidates=64, max_detections=8, min_area=4.0),
    num_classifier_classes=5,
    det_input_size=160,
)


@pytest.fixture(scope="module")
def pipe():
    return TwoStagePipeline.initialize(SMALL, seed=0)


@pytest.mark.slow
def test_mesh_serving_matches_single_device(pipe):
    mesh = make_mesh(8, backend="cpu")
    server = MeshServer(pipe, mesh)
    assert server.data_parallelism == 8

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (16, 200, 300, 3), dtype=np.uint8)

    sharded = {k: np.asarray(v) for k, v in server.serve(frames, 0.01).items()}
    single = {k: np.asarray(v) for k, v in pipe.run_fused(frames, 0.01).items()}

    for k in single:
        np.testing.assert_allclose(
            sharded[k].astype(np.float64),
            single[k].astype(np.float64),
            atol=1e-4,
            err_msg=k,
        )
    # outputs actually live sharded across the mesh
    out = server.serve(frames, 0.01)
    assert len(out["boxes"].sharding.device_set) == 8


def test_indivisible_batch_rejected(pipe):
    mesh = make_mesh(8, backend="cpu")
    server = MeshServer(pipe, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        server.serve(np.zeros((5, 200, 300, 3), np.uint8))
