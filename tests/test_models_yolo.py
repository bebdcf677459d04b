"""Detector model structure tests: output contract, parameter budget, and
config-family coverage (yolo_plus_v1/v2 per SURVEY §2.2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litepi_tpu.core.types import YOLO_PLUS_V1, YOLO_PLUS_V2, YOLOV8N
from litepi_tpu.models import YoloLitePi


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def v2_model_and_vars():
    model = YoloLitePi(YOLO_PLUS_V2)
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_output_contract(v2_model_and_vars):
    model, variables = v2_model_and_vars
    x = jnp.zeros((2, 640, 640, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    # (B, 8400, 64) reg + (B, 8400, 1) cls — the exported graph's (65, 8400)
    # split 64/1 (model.ncnn.param:188-189)
    assert out["reg"].shape == (2, 8400, 4 * YOLO_PLUS_V2.reg_max)
    assert out["cls"].shape == (2, 8400, YOLO_PLUS_V2.num_classes)
    assert out["reg"].dtype == jnp.float32  # f32 model -> f32 logits


def test_v2_param_budget(v2_model_and_vars):
    """README.md:14 claims 1.8M params for the shipped yolo_plus_v2."""
    _, variables = v2_model_and_vars
    n = _param_count(variables["params"])
    assert 1.4e6 < n < 2.2e6, f"param count {n} far from the 1.8M reference claim"


def test_v1_is_half_width():
    model = YoloLitePi(YOLO_PLUS_V1)
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x, train=False)
    )
    n = _param_count(variables["params"])
    # ~0.97M per SURVEY §2.2 (vntsr model.ncnn.param stem 8ch)
    assert 0.7e6 < n < 1.3e6, f"param count {n} far from the 0.97M reference claim"
    assert YOLO_PLUS_V1.channels == (8, 16, 32, 64, 128)


def test_config_channel_math():
    assert YOLO_PLUS_V2.channels == (16, 24, 48, 96, 192)
    assert YOLO_PLUS_V2.depths == (1, 2, 2, 1)
    assert YOLO_PLUS_V2.reg_channels == 64  # 4 * reg_max (model.ncnn.param:151-155)
    assert YOLO_PLUS_V2.cls_channels == 48  # (model.ncnn.param:156-160)
    assert YOLOV8N.channels == (16, 32, 64, 128, 256)


def test_smaller_input_scales_anchors(v2_model_and_vars):
    """Static-shape contract: a 320 input yields 2100 anchors (40^2+20^2+10^2)."""
    model, _ = v2_model_and_vars
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["reg"].shape == (1, 2100, 64)


def test_bf16_compute_stays_finite():
    # dtype discipline is config-independent: a tiny variant compiles 10x
    # faster than the flagship and proves the same property
    tiny = dataclasses.replace(
        YOLO_PLUS_V2, name="tiny_bf16",
        base_channels=(32, 64, 128, 256, 512), input_size=64,
    )
    model = YoloLitePi(tiny, dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["reg"].dtype == jnp.bfloat16  # logits stay in compute dtype
    assert bool(jnp.isfinite(out["reg"].astype(jnp.float32)).all())
    # params must stay float32 regardless of compute dtype
    p = variables["params"]["backbone"]["stem"]["conv"]["kernel"]
    assert p.dtype == jnp.float32
