"""Fused uint8 letterbox+stem Pallas kernel: golden parity vs the XLA path.

Runs in Pallas interpreter mode off-TPU (tests/conftest.py pins CPU); the
same code path compiles with Mosaic on chip, where bench.py A/Bs it
(PipelineConfig.stem_impl)."""

import numpy as np
import pytest


@pytest.mark.parametrize("use_mxu", [True, False])
def test_kernel_matches_xla_conv(use_mxu):
    import jax
    import jax.numpy as jnp

    from litepi_tpu.ops.pallas_stem import pallas_stem

    rng = np.random.RandomState(0)
    b, h, w, co = 2, 160, 160, 16
    frames = rng.randint(0, 256, (b, h, w, 3), dtype=np.uint8)
    k = (rng.randn(3, 3, 3, co) * 0.05).astype(np.float32)
    bias = (rng.randn(co) * 0.1).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(frames, jnp.float32), jnp.asarray(k), (2, 2),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    ref = np.asarray(ref * jax.nn.sigmoid(ref))

    out = np.asarray(
        pallas_stem(
            jnp.asarray(frames), jnp.asarray(k), jnp.asarray(bias),
            interpret=True, use_mxu=use_mxu, out_dtype=jnp.float32,
        )
    )
    assert out.shape == (b, h // 2, w // 2, co)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_pipeline_parity_pallas_vs_xla_stem():
    """The full serving program with stem_impl='pallas' must reproduce the
    XLA-stem program's detections on identity-geometry uint8 frames."""
    import dataclasses

    import jax.numpy as jnp

    from litepi_tpu.core.types import (
        DetectorConfig,
        NMSConfig,
        PipelineConfig,
    )
    from litepi_tpu.pipeline.two_stage import TwoStagePipeline

    det = DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=160
    )
    base = PipelineConfig(
        detector=det,
        nms=NMSConfig(max_candidates=64, max_detections=8),
        det_input_size=160,
        cls_input_size=32,
        num_classifier_classes=5,
    )
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (2, 160, 160, 3), dtype=np.uint8)

    outs = {}
    for impl in ("xla", "pallas"):
        cfg = dataclasses.replace(base, stem_impl=impl)
        pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=jnp.float32)
        outs[impl] = {
            k: np.asarray(v)
            for k, v in pipe.run_fused(frames, conf_threshold=0.01).items()
        }
    np.testing.assert_array_equal(outs["xla"]["valid"], outs["pallas"]["valid"])
    np.testing.assert_allclose(
        outs["xla"]["det_scores"], outs["pallas"]["det_scores"], atol=2e-3
    )
    np.testing.assert_allclose(
        outs["xla"]["boxes"], outs["pallas"]["boxes"], atol=0.5
    )
