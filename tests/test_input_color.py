"""Colour-order handling: BGR host frames vs the RGB compute convention.

The reference converts cv2-BGR to RGB before both stages (e2e.py:224,
:385).  The framework instead declares the host order in
``PipelineConfig.input_color`` and reverses the channel axis inside the
jitted programs (XLA fuses the flip — no host cvtColor pass).  The
contract these tests pin down: a ``input_color="bgr"`` pipeline fed BGR
buffers is BIT-IDENTICAL to an ``input_color="rgb"`` pipeline fed the
pre-flipped buffers, at every entry point (fused, staged detect,
classify).
"""

import dataclasses

import numpy as np
import pytest

from litepi_tpu.core.types import (
    DetectorConfig,
    NMSConfig,
    PipelineConfig,
)
from litepi_tpu.pipeline import TwoStagePipeline
from litepi_tpu.pipeline.evaluator import int_crop_coords

CFG_RGB = PipelineConfig(
    detector=DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=160
    ),
    nms=NMSConfig(max_candidates=128, max_detections=8, min_area=4.0),
    classifier_arch="shufflenetv2",
    num_classifier_classes=10,
    det_input_size=160,
    cls_input_size=64,
    input_color="rgb",
)
CFG_BGR = dataclasses.replace(CFG_RGB, input_color="bgr")


@pytest.fixture(scope="module")
def pipes():
    """Two pipelines over the SAME weights, differing only in input_color."""
    from litepi_tpu.models import YoloLitePi, build_classifier
    from litepi_tpu.models.init_utils import fast_init

    det_vars = fast_init(YoloLitePi(CFG_RGB.detector), seed=0)
    cls_vars = fast_init(
        build_classifier("shufflenetv2", 10),
        seed=1,
        spatial=CFG_RGB.cls_input_size,
    )
    return (
        TwoStagePipeline(CFG_RGB, det_vars, cls_vars),
        TwoStagePipeline(CFG_BGR, det_vars, cls_vars),
    )


def test_fused_bgr_parity(pipes):
    """run_fused(bgr frames) under a bgr config == run_fused(rgb frames)
    under rgb — every output bit-identical (letterbox, crop-resize and
    normalise are all per-channel, so the flip commutes exactly)."""
    pipe_rgb, pipe_bgr = pipes
    rng = np.random.default_rng(0)
    frames_bgr = rng.integers(0, 256, (2, 200, 300, 3), dtype=np.uint8)
    frames_rgb = frames_bgr[..., ::-1].copy()
    out_b = pipe_bgr.run_fused(frames_bgr, conf_threshold=0.0001)
    out_r = pipe_rgb.run_fused(frames_rgb, conf_threshold=0.0001)
    assert set(out_b) == set(out_r)
    for k in out_r:
        np.testing.assert_array_equal(
            np.asarray(out_b[k]), np.asarray(out_r[k]), err_msg=k
        )


def test_staged_bgr_parity(pipes):
    pipe_rgb, pipe_bgr = pipes
    rng = np.random.default_rng(1)
    canvas_bgr = rng.uniform(0, 1, (1, 160, 160, 3)).astype(np.float32)
    canvas_rgb = canvas_bgr[..., ::-1].copy()
    det_b = pipe_bgr.detect(canvas_bgr, conf_threshold=0.0001)
    det_r = pipe_rgb.detect(canvas_rgb, conf_threshold=0.0001)
    for k in det_r:
        np.testing.assert_array_equal(
            np.asarray(det_b[k]), np.asarray(det_r[k]), err_msg=k
        )
    crops_bgr = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    crops_rgb = crops_bgr[..., ::-1].copy()
    np.testing.assert_array_equal(
        np.asarray(pipe_bgr.classify(crops_bgr)),
        np.asarray(pipe_rgb.classify(crops_rgb)),
    )


def test_flip_is_active(pipes):
    """The bgr flip must actually change what the model sees: identical
    buffers through the two configs disagree (random weights are not
    channel-symmetric)."""
    pipe_rgb, pipe_bgr = pipes
    rng = np.random.default_rng(2)
    crops = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    assert not np.allclose(
        np.asarray(pipe_bgr.classify(crops)),
        np.asarray(pipe_rgb.classify(crops)),
    )


# ---------------------------------------------------------------------- #
# shared integer crop geometry (pure numpy — smoke-lane eligible)         #
# ---------------------------------------------------------------------- #


def test_int_crop_coords_bounds_and_truncation():
    w, h = 300, 200
    boxes = np.array(
        [
            [10.7, 20.9, 50.2, 60.99],  # plain truncation
            [-5.0, -3.5, 4.2, 7.8],  # negative corners clamp to 0
            [295.0, 195.0, 400.0, 300.0],  # beyond right/bottom edge
            [300.0, 200.0, 310.0, 220.0],  # fully outside -> pinned 1px
            [100.0, 100.0, 100.3, 100.4],  # degenerate -> forced 1px
        ],
        np.float32,
    )
    xi1, yi1, xi2, yi2 = int_crop_coords(boxes, w, h)
    assert (xi1 >= 0).all() and (yi1 >= 0).all()
    assert (xi2 <= w).all() and (yi2 <= h).all()
    assert (xi2 > xi1).all() and (yi2 > yi1).all()
    np.testing.assert_array_equal(xi1, [10, 0, 295, 299, 100])
    np.testing.assert_array_equal(yi1, [20, 0, 195, 199, 100])
    np.testing.assert_array_equal(xi2, [50, 4, 300, 300, 101])
    np.testing.assert_array_equal(yi2, [60, 7, 200, 200, 101])


def test_int_crop_coords_empty():
    out = int_crop_coords(np.zeros((0, 4), np.float32), 10, 10)
    for a in out:
        assert a.shape == (0,)


def test_min_area_filter_matches_crop_geometry():
    """The survival rule is defined on the SAME integers the cropper
    slices with: float area and int-crop area straddle min_area in
    opposite directions for these boxes."""
    w = h = 100
    min_area = 9.0
    # float area 4.5*2=9.0 >= 9, but the int crop [5,9)x[5,7) = 8 < 9:
    # the crop the classifier would see fails the floor -> DROPPED
    a = [5.0, 5.0, 9.5, 7.0]
    # float area 3.6*4.8=17.3 >= 9; int crop [2,5)x[3,7) = 12 >= 9
    b = [2.2, 3.1, 5.8, 7.9]
    # float area 2.1*4.1=8.61 < 9; int crop [5,8)x[5,10) = 15 >= 9 ->
    # SURVIVES: the crop the classifier sees is that big (truncating the
    # top-left corner grows the slice; the reference keeps it too)
    c = [5.9, 5.9, 8.0, 10.0]
    boxes = np.array([a, b, c], np.float32)
    xi1, yi1, xi2, yi2 = int_crop_coords(boxes, w, h)
    keep = (xi2 - xi1) * (yi2 - yi1) >= min_area
    np.testing.assert_array_equal(keep, [False, True, True])
