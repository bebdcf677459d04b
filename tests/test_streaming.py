"""Streaming runner: ordering, padding, box unmapping and the benchmark."""

import numpy as np
import pytest

from litepi_tpu.core.types import DetectorConfig, NMSConfig, PipelineConfig
from litepi_tpu.pipeline import TwoStagePipeline
from litepi_tpu.pipeline.streaming import StreamingRunner

SMALL = PipelineConfig(
    detector=DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=160
    ),
    nms=NMSConfig(max_candidates=64, max_detections=8, min_area=1.0),
    num_classifier_classes=4,
    det_input_size=160,
)


@pytest.fixture(scope="module")
def pipe():
    return TwoStagePipeline.initialize(SMALL, seed=0)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("stream")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(10):
        img = rng.integers(0, 200, (120, 200, 3), dtype=np.uint8)
        p = str(root / f"f{i:03d}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


@pytest.mark.parametrize("use_native", [False, True])
def test_stream_order_and_shapes(pipe, jpeg_dir, use_native):
    from litepi_tpu.data import native_loader

    if use_native and not native_loader.available():
        pytest.skip("native loader unavailable")
    runner = StreamingRunner(
        pipe, batch_size=4, inflight=2, use_native_loader=use_native
    )
    seen = []
    for batch_paths, out in runner.run(jpeg_dir, conf_threshold=0.05):
        seen.extend(batch_paths)
        # outputs are sliced to the real entries (trailing batch: 2 of 4)
        assert out["boxes"].shape == (len(batch_paths), 8, 4)
        assert np.isfinite(out["boxes"]).all()
        if use_native:
            # boxes unmapped to original 200x120 pixel space
            assert (out["boxes"][..., [0, 2]] <= 200 + 1e-3).all()
            assert (out["boxes"][..., [1, 3]] <= 120 + 1e-3).all()
    # all inputs covered, in order, with NO duplicated padding entries
    assert seen == list(jpeg_dir)
    runner.close()


def test_stream_benchmark(pipe, jpeg_dir):
    runner = StreamingRunner(pipe, batch_size=4, use_native_loader=False)
    stats = runner.benchmark(jpeg_dir, conf_threshold=0.05)
    # only real frames count — padded repeats must not inflate FPS
    assert stats["frames"] == 10
    assert stats["fps"] > 0
    runner.close()


def test_area_scale_controls_min_area_floor(pipe, jpeg_dir):
    """run_fused's per-frame area_scale rescales box areas before the
    min-area floor: a huge scale passes everything the conf gate kept, a
    tiny scale zeroes the valid mask (the native pre-letterboxed path
    passes 1/ratio^2 so the floor stays in original pixels)."""
    import cv2

    frames = np.stack([cv2.imread(p) for p in jpeg_dir[:4]])
    big = pipe.run_fused(frames, 0.05, area_scale=np.full(4, 1e6, np.float32))
    tiny = pipe.run_fused(frames, 0.05, area_scale=np.full(4, 1e-9, np.float32))
    none = pipe.run_fused(frames, 0.05)
    assert not np.asarray(tiny["valid"]).any()
    assert np.asarray(big["valid"]).sum() >= np.asarray(none["valid"]).sum()


def test_native_and_cv2_paths_agree(pipe, jpeg_dir):
    """Same images through both loaders must yield near-identical boxes in
    original pixel space (decode+resize differ by ~1 LSB)."""
    from litepi_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native loader unavailable")
    paths = jpeg_dir[:4]
    a = StreamingRunner(pipe, batch_size=4, use_native_loader=False)
    b = StreamingRunner(pipe, batch_size=4, use_native_loader=True)
    (_, out_a), = list(a.run(paths, conf_threshold=0.05))
    (_, out_b), = list(b.run(paths, conf_threshold=0.05))
    va, vb = out_a["valid"], out_b["valid"]
    assert va.sum() == vb.sum()
    if va.any():
        # decode/resize differ by ~1 LSB between the loaders, so
        # NEAR-TIE detections may come back in a different score order;
        # compare as canonically sorted sets, not positionally
        def canon(boxes):
            boxes = np.asarray(boxes, np.float64)
            return boxes[np.lexsort(boxes.T[::-1])]

        np.testing.assert_allclose(
            canon(out_a["boxes"][va]), canon(out_b["boxes"][vb]), atol=2.0
        )
    a.close()
    b.close()
