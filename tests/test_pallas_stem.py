"""Fused uint8 letterbox+stem Pallas kernel: golden parity vs the XLA conv.

The kernel is a RETAINED EXPERIMENT (round 3): numerically correct (these
tests, interpreter mode) but not lowerable by Mosaic on real TPU — the
interleaved-NHWC lane regrouping it needs ((W*3,) -> (W/2, 6) minor-dim
splits) is an unsupported shape cast, and reformulations that avoid lane
splits need host-side phase-split/transpose passes that cost as much HBM
traffic as the canvas they'd save.  See ops/pallas_stem.py's docstring for
the full account; the serving pipeline keeps the XLA letterbox+stem."""

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


def test_model_runs_from_precomputed_stem():
    """YoloLitePi(from_stem=True) consumes precomputed stem activations
    and reproduces the normal forward (the integration hook the kernel
    would use; kept functional for a future lowering)."""
    import jax
    import jax.numpy as jnp

    from litepi_tpu.core.types import DetectorConfig
    from litepi_tpu.models.init_utils import fast_init
    from litepi_tpu.models.yolo import YoloLitePi

    cfg = DetectorConfig(
        name="tiny_fs", base_channels=(32, 64, 128, 256, 512), input_size=64
    )
    model = YoloLitePi(cfg)
    variables = fast_init(model, seed=0)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32
    )
    full = model.apply(variables, x, train=False)
    # compute the stem exactly as the backbone does, then feed from_stem
    from litepi_tpu.models.layers import ConvBN

    stem = ConvBN(cfg.channels[0], 3, 2)
    stem_vars = {
        "params": variables["params"]["backbone"]["stem"],
        "batch_stats": variables["batch_stats"]["backbone"]["stem"],
    }
    act = stem.apply(stem_vars, x, False)
    part = model.apply(variables, act, train=False, from_stem=True)
    np.testing.assert_allclose(
        np.asarray(full["reg"]), np.asarray(part["reg"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full["cls"]), np.asarray(part["cls"]), atol=1e-5
    )
