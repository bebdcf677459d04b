"""SSD300-VGG16 baseline detector in Flax (NHWC).

The reference trains SSD300-VGG16 (and Faster-RCNN) as accuracy/latency
baselines against YOLO-LitePi (reference:
train_model/train-other-model-tsd-*.ipynb cell 13 — torchvision
``ssd300_vgg16`` with AdamW 1e-4 + cosine; benchmarked at 1.15 FPS on the Pi,
README/Eval detect_eval_results_fps_rcnn_ssd.csv:3).  This is a ground-up
Flax implementation of the same architecture family:

* VGG16 feature extractor (conv1_1..conv5_3; ceil-mode pool3; pool5 3x3/1),
  dilated conv6 (1024, rate 6) + conv7 (1024, 1x1),
* extra feature layers conv8..conv11,
* L2Norm(scale 20) on conv4_3,
* per-level loc (4k) / conf (nc+1, softmax with background class) heads over
  the classic 8732-box default-box grid (feature maps 38/19/10/5/3/1 with
  4/6/6/6/4/4 boxes per cell),
* multibox loss with hard-negative mining (3:1) — see
  :func:`litepi_tpu.train.ssd_loss.multibox_loss`.

Like the YOLO family here, all shapes are static; decode + NMS reuse
litepi_tpu.ops.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class L2Norm(nn.Module):
    """Channelwise L2 normalisation with learned scale (SSD's conv4_3 norm)."""

    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (x.shape[-1],),
        )
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-10)
        return (x / norm.astype(x.dtype)) * scale.astype(x.dtype)


def _conv(f, k, name, dilation=1, stride=1, padding=None):
    pad = (k // 2) * dilation if padding is None else padding
    return nn.Conv(
        f,
        (k, k),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        name=name,
    )


# feature-map sizes and boxes-per-cell for 300x300 input
SSD_GRIDS = (38, 19, 10, 5, 3, 1)
SSD_BOXES_PER_CELL = (4, 6, 6, 6, 4, 4)
NUM_SSD_BOXES = sum(g * g * b for g, b in zip(SSD_GRIDS, SSD_BOXES_PER_CELL))  # 8732


def ssd_default_boxes(image_size: int = 300) -> np.ndarray:
    """The classic SSD300 default-box grid -> (8732, 4) cxcywh in pixels.

    Scales follow the torchvision/paper recipe: conv4_3 at 0.07, then
    0.15..0.9 linear over the remaining 5 maps; aspect ratios
    {1, 2, 1/2} (+{3, 1/3} on the 6-box maps) plus the sqrt(s_k s_{k+1})
    extra square box.
    """
    scales = [0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05]
    boxes: List[List[float]] = []
    for level, (g, nb) in enumerate(zip(SSD_GRIDS, SSD_BOXES_PER_CELL)):
        s = scales[level]
        s_next = scales[level + 1]
        ratios = [1.0, 2.0, 0.5] if nb == 4 else [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0]
        for y in range(g):
            for x in range(g):
                cx = (x + 0.5) / g
                cy = (y + 0.5) / g
                for r in ratios:
                    w = s * np.sqrt(r)
                    h = s / np.sqrt(r)
                    boxes.append([cx, cy, w, h])
                # extra square box at the geometric-mean scale
                sp = np.sqrt(s * s_next)
                boxes.append([cx, cy, sp, sp])
    out = np.asarray(boxes, np.float32)
    assert out.shape[0] == NUM_SSD_BOXES, out.shape
    return np.clip(out, 0.0, 1.0) * image_size


class SSD300(nn.Module):
    """SSD300-VGG16.  Input (B, 300, 300, 3); returns raw per-box outputs:
    ``loc`` (B, 8732, 4) offsets and ``conf`` (B, 8732, nc+1) logits
    (class 0 = background)."""

    num_classes: int  # foreground classes (background added internally)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        del train  # VGG-SSD uses no batchnorm
        dt = self.dtype
        x = x.astype(dt)

        def block(x, convs, name, pool=True, ceil=False):
            for i, f in enumerate(convs):
                x = nn.relu(_conv(f, 3, f"{name}_{i + 1}")(x))
            if pool:
                if ceil and x.shape[1] % 2:  # ceil-mode pool: pad bottom/right
                    x = jnp.pad(
                        x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge"
                    )
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return x

        x = block(x, (64, 64), "conv1")           # 150
        x = block(x, (128, 128), "conv2")         # 75
        x = block(x, (256, 256, 256), "conv3", ceil=True)  # 38
        c4 = block(x, (512, 512, 512), "conv4", pool=False)
        x = nn.max_pool(c4, (2, 2), strides=(2, 2))  # 19
        x = block(x, (512, 512, 512), "conv5", pool=False)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.relu(_conv(1024, 3, "conv6", dilation=6)(x))   # 19
        c7 = nn.relu(_conv(1024, 1, "conv7")(x))              # 19

        y = nn.relu(_conv(256, 1, "conv8_1")(c7))
        c8 = nn.relu(_conv(512, 3, "conv8_2", stride=2)(y))   # 10
        y = nn.relu(_conv(128, 1, "conv9_1")(c8))
        c9 = nn.relu(_conv(256, 3, "conv9_2", stride=2)(y))   # 5
        y = nn.relu(_conv(128, 1, "conv10_1")(c9))
        c10 = nn.relu(_conv(256, 3, "conv10_2", padding=0)(y))  # 3
        y = nn.relu(_conv(128, 1, "conv11_1")(c10))
        c11 = nn.relu(_conv(256, 3, "conv11_2", padding=0)(y))  # 1

        feats = [L2Norm(name="l2norm")(c4), c7, c8, c9, c10, c11]

        locs, confs = [], []
        nc1 = self.num_classes + 1
        for i, (f, nb) in enumerate(zip(feats, SSD_BOXES_PER_CELL)):
            b = f.shape[0]
            loc = _conv(nb * 4, 3, f"loc{i}")(f)
            conf = _conv(nb * nc1, 3, f"conf{i}")(f)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, nc1))
        return {
            "loc": jnp.concatenate(locs, 1).astype(jnp.float32),
            "conf": jnp.concatenate(confs, 1).astype(jnp.float32),
        }


def decode_ssd_boxes(
    loc: jnp.ndarray,  # (..., N, 4) predicted offsets
    default_boxes: jnp.ndarray,  # (N, 4) cxcywh pixels
    variances: Tuple[float, float] = (0.1, 0.2),
) -> jnp.ndarray:
    """SSD box decode: offsets + default boxes -> xyxy pixels."""
    d_cx, d_cy, d_w, d_h = (default_boxes[..., i] for i in range(4))
    cx = loc[..., 0] * variances[0] * d_w + d_cx
    cy = loc[..., 1] * variances[0] * d_h + d_cy
    w = jnp.exp(jnp.clip(loc[..., 2] * variances[1], -10, 10)) * d_w
    h = jnp.exp(jnp.clip(loc[..., 3] * variances[1], -10, 10)) * d_h
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )
