"""YOLOv11n baseline: structure, attention block and shared output contract."""

import jax
import jax.numpy as jnp
import numpy as np

from litepi_tpu.models.yolov11 import C2PSA, YoloV11


def test_forward_contract_and_params():
    model = YoloV11(num_classes=1)
    assert model.channels == (16, 32, 64, 128, 256)
    x = jnp.zeros((1, 320, 320, 3))
    # shapes + param count via abstract tracing — no compilation needed
    # (the real forward executes in test_v11_works_with_shared_decode)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x, train=False)
    )
    out = jax.eval_shape(
        lambda v: model.apply(v, x, train=False), variables
    )
    # same contract as YoloLitePi: shared decode/NMS/eval
    assert out["reg"].shape == (1, 2100, 64)
    assert out["cls"].shape == (1, 2100, 1)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # v11n is ~2.6M params
    assert 1.8e6 < n < 3.5e6, n


def test_c2psa_attention_shapes():
    block = C2PSA(features=128, n=1)
    x = jnp.ones((2, 10, 10, 128))
    variables = block.init(jax.random.key(0), x, train=False)
    y = block.apply(variables, x, train=False)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_v11_works_with_shared_decode():
    """v11 output plugs into the same DFL decode + NMS path as yolo_plus."""
    from litepi_tpu.ops.anchors import make_anchors
    from litepi_tpu.ops.dfl import decode_boxes, dfl_decode
    from litepi_tpu.ops.nms import nms_sorted

    model = YoloV11(num_classes=1)
    x = jnp.zeros((1, 320, 320, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    out = model.apply(variables, x, train=False)

    pts, strides = map(jnp.asarray, make_anchors(320))
    scores = jax.nn.sigmoid(out["cls"])[..., 0]
    top_s, idx = jax.lax.top_k(scores, 64)  # nms_sorted wants sorted input
    reg = jnp.take_along_axis(out["reg"], idx[..., None], axis=1)
    boxes = decode_boxes(dfl_decode(reg, 16), pts[idx], strides[idx], xywh=False)
    cls = jnp.zeros_like(top_s, jnp.int32)
    b, s, c, v = nms_sorted(boxes, top_s, cls, 0.5, 0.45, 8, use_pallas=False)
    assert b.shape == (1, 8, 4)
