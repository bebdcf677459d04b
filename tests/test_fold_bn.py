"""BN folding (deploy-form weights) vs the unfused inference forward.

fold_batchnorm must be exact: fused-model outputs equal unfused-model
inference outputs to float32 rounding, for the detector family and through
the pipeline constructor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litepi_tpu.core.types import YOLO_PLUS_V1, DetectorConfig, PipelineConfig
from litepi_tpu.models import YoloLitePi
from litepi_tpu.weights.fold_bn import (
    fold_batchnorm,
    fold_detector_pipeline_vars,
    has_batchnorm,
)

TINY = DetectorConfig(name="tiny", input_size=64)


def _init_vars(model, size):
    return model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32)
    )


def test_fold_exact_forward():
    unfused = YoloLitePi(TINY)
    fused = YoloLitePi(TINY, fused=True)
    variables = _init_vars(unfused, 64)
    # make running stats non-trivial so the fold actually does work
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.random.default_rng(0).standard_normal(x.shape)
        .astype(np.float32),
        variables,
    )
    folded = fold_batchnorm(variables)
    assert not has_batchnorm(folded)

    x = jnp.asarray(
        np.random.default_rng(1).random((2, 64, 64, 3)), jnp.float32
    )
    a = unfused.apply(variables, x, train=False)
    b = fused.apply(folded, x, train=False)
    np.testing.assert_allclose(a["reg"], b["reg"], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(a["cls"], b["cls"], atol=2e-4, rtol=1e-4)


def test_fold_idempotent_and_param_shapes():
    model = YoloLitePi(TINY)
    variables = _init_vars(model, 64)
    folded = fold_batchnorm(variables)
    again = fold_batchnorm(folded)
    assert jax.tree_util.tree_structure(folded) == jax.tree_util.tree_structure(again)
    # fused model accepts the folded tree directly
    fused = YoloLitePi(TINY, fused=True)
    ref = fused.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    assert (
        jax.tree_util.tree_structure(ref["params"])
        == jax.tree_util.tree_structure(folded["params"])
    )


def test_pipeline_constructor_folds():
    from litepi_tpu.pipeline import TwoStagePipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(name="tiny_v1", base_channels=YOLO_PLUS_V1.base_channels,
                                input_size=64),
        det_input_size=64,
        cls_input_size=32,
    )
    pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=jnp.float32)
    assert pipe.det_model.fused
    assert "batch_stats" not in pipe.det_vars
    out = pipe.run_fused(
        np.zeros((1, 64, 64, 3), np.uint8), conf_threshold=0.5
    )
    assert np.isfinite(np.asarray(out["cls_probs"])).all()


def test_fused_model_refuses_training():
    fused = YoloLitePi(TINY, fused=True)
    variables = fold_batchnorm(_init_vars(YoloLitePi(TINY), 64))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    try:
        fused.apply(variables, x, train=True)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_fused_pipeline_pallas_roi_path():
    """roi_impl='pallas' through run_fused (interpreter mode off-TPU)."""
    import dataclasses

    from litepi_tpu.pipeline import TwoStagePipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(name="tiny_p", input_size=64),
        det_input_size=64,
        cls_input_size=32,
        roi_impl="pallas",
    )
    pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=jnp.float32)
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 64, 64, 3), np.uint8
    )
    out = pipe.run_fused(frames, conf_threshold=0.01)
    assert np.isfinite(np.asarray(out["cls_probs"])).all()
    # dense path on the same weights must agree wherever detections exist
    dense = TwoStagePipeline(
        dataclasses.replace(cfg, roi_impl="dense"),
        pipe.det_vars,
        pipe.cls_vars,
        dtype=jnp.float32,
    ).run_fused(frames, conf_threshold=0.01)
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(dense["boxes"]), atol=1e-5
    )
    # with the pipeline dtype threaded into the kernel (f32 here), the
    # classifier inputs — and so the probabilities — must agree too
    np.testing.assert_allclose(
        np.asarray(out["cls_probs"]), np.asarray(dense["cls_probs"]),
        atol=1e-4,
    )


# the two depthwise-heavy archs compile slowest on CPU; the fold algebra
# they exercise is identical, so they live in the slow lane (fast lane
# keeps the flagship ShuffleNetV2 and the densest arch)
@pytest.mark.parametrize(
    "arch",
    [
        "shufflenetv2",
        "resnet18",
        pytest.param("mobilenetv2", marks=pytest.mark.slow),
        pytest.param("efficientnet", marks=pytest.mark.slow),
    ],
)
def test_classifier_fold_exact(arch):
    """Deploy-form classifiers equal their unfused inference forward."""
    from litepi_tpu.models import build_classifier
    from litepi_tpu.models.registry import CLASSIFIER_BN_EPS

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    unfused = build_classifier(arch, 7)
    fused = build_classifier(arch, 7, fused=True)
    variables = unfused.init(jax.random.PRNGKey(0), x[:1])
    # perturb running stats so the fold is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.03 * np.random.default_rng(1)
        .standard_normal(a.shape).astype(np.float32),
        variables,
    )
    folded = fold_batchnorm(variables, eps=CLASSIFIER_BN_EPS)
    assert not has_batchnorm(folded), arch
    a = unfused.apply(variables, x, train=False)
    b = fused.apply(folded, x, train=False)
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3, err_msg=arch)


def test_pipeline_folds_classifier_too():
    from litepi_tpu.pipeline import TwoStagePipeline

    cfg = PipelineConfig(
        detector=DetectorConfig(name="tiny_cf", input_size=64),
        det_input_size=64,
        cls_input_size=32,
    )
    pipe = TwoStagePipeline.initialize(cfg, seed=0, dtype=jnp.float32)
    assert pipe.cls_model.fused
    assert "batch_stats" not in pipe.cls_vars
    out = pipe.run_fused(np.zeros((1, 64, 64, 3), np.uint8), 0.5)
    assert np.isfinite(np.asarray(out["cls_probs"])).all()


def test_fold_scales_preexisting_conv_bias():
    """BN(conv(x)+b) = s*(conv(x)+b-mean)+beta: a conv bias present BEFORE
    folding must scale by s (regression: it was added unscaled)."""
    import numpy as np

    k = np.ones((1, 1, 1, 2), np.float32)
    b = np.asarray([10.0, -4.0], np.float32)
    scale = np.asarray([2.0, 0.5], np.float32)
    beta = np.asarray([1.0, 1.0], np.float32)
    mean = np.asarray([3.0, 3.0], np.float32)
    var = np.asarray([1.0 - 1e-3, 4.0 - 1e-3], np.float32)
    variables = {
        "params": {"blk": {"conv": {"kernel": k, "bias": b},
                           "bn": {"scale": scale, "bias": beta}}},
        "batch_stats": {"blk": {"bn": {"mean": mean, "var": var}}},
    }
    folded = fold_batchnorm(variables)  # eps 1e-3 -> sqrt(var+eps) = 1, 2
    s = scale / np.sqrt(var + 1e-3)
    expect = b * s + beta - mean * s
    np.testing.assert_allclose(
        np.asarray(folded["params"]["blk"]["conv"]["bias"]), expect,
        rtol=1e-6,
    )


def test_fold_stem_input_exact():
    """fold_stem_input: conv(flip(x) * s, W) == conv(x, flip_cin(W) * s) for
    the whole detector graph — the fused serving program feeds raw 0-255
    letterbox pixels and carries the reference's host normalisation
    (e2e.py:224-238) inside the stem kernel instead of as elementwise
    passes over the canvas."""
    from litepi_tpu.weights.fold_bn import fold_stem_input

    model = YoloLitePi(TINY, fused=True)
    variables = jax.device_put(
        jax.tree.map(
            lambda x: x,
            _init_fused_vars(model),
        )
    )
    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.float32)

    ref = model.apply(variables, jnp.asarray(raw[..., ::-1] / 255.0), train=False)
    folded = fold_stem_input(variables, 1.0 / 255.0, flip_channels=True)
    got = model.apply(folded, jnp.asarray(raw), train=False)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )
    # the input tree must not be mutated
    assert variables["params"]["backbone"]["stem"]["conv"]["kernel"].shape == (
        folded["params"]["backbone"]["stem"]["conv"]["kernel"].shape
    )


def _init_fused_vars(model):
    unfused = YoloLitePi(TINY, fused=False)
    variables = _init_vars(unfused, TINY.input_size)
    return fold_batchnorm(variables)
