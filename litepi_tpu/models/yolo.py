"""The YOLO-LitePi detector as a native Flax model.

Re-creates the capability of the reference's exported ``yolo_plus`` graphs
(reference: src/tt100k/convert/model/yolo_plus/yolo_plus_ncnn_model/
model.ncnn.param:3-208 — a channel-pruned anchor-free YOLOv8-derived detector)
from a typed :class:`~litepi_tpu.core.types.DetectorConfig` instead of a YAML:

* backbone: stem -> 4 stages of (strided ConvBN + C2f) -> SPPF
  (stem 16ch -> 24 -> 48 -> 96 -> 192 for yolo_plus_v2; C2f repeats 1/2/2/1);
* PAN-FPN neck: top-down upsample+concat+C2f, bottom-up downsample+concat+C2f;
* decoupled anchor-free head per P3/P4/P5: a 4*reg_max-channel DFL box branch
  (64ch at reg_max=16 — model.ncnn.param:151-155) and an nc-channel class
  branch (48ch hidden — :156-160).

The model returns raw flattened head outputs; the DFL decode / anchor table /
sigmoid live in :mod:`litepi_tpu.ops` so training (which needs raw
distributions for the DFL loss) and serving share one forward graph.

Layout is NHWC end-to-end; anchors flatten row-major (y, x) per level,
P3..P5 concatenated — identical to the reference's (65, 8400) ordering.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from litepi_tpu.core.types import DetectorConfig
from litepi_tpu.models.layers import C2f, ConvBN, SPPF, upsample2x_nearest


class Backbone(nn.Module):
    cfg: DetectorConfig
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        from_stem: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c = self.cfg.channels  # (stem, p2, p3, p4, p5)
        d = self.cfg.depths  # C2f repeats per stage
        dt, fu = self.dtype, self.fused

        if not from_stem:
            x = ConvBN(c[0], 3, 2, dtype=dt, fused=fu, name="stem")(x, train)
        # else: x is the precomputed stem activation (B, H/2, W/2, c0) from
        # the Pallas fused letterbox+stem kernel (ops/pallas_stem.py); the
        # stem params simply go unused (flax.apply tolerates extras)
        x = ConvBN(c[1], 3, 2, dtype=dt, fused=fu, name="down1")(x, train)
        x = C2f(c[1], d[0], shortcut=True, dtype=dt, fused=fu, name="c2f1")(x, train)
        x = ConvBN(c[2], 3, 2, dtype=dt, fused=fu, name="down2")(x, train)
        p3 = C2f(c[2], d[1], shortcut=True, dtype=dt, fused=fu, name="c2f2")(x, train)
        x = ConvBN(c[3], 3, 2, dtype=dt, fused=fu, name="down3")(p3, train)
        p4 = C2f(c[3], d[2], shortcut=True, dtype=dt, fused=fu, name="c2f3")(x, train)
        x = ConvBN(c[4], 3, 2, dtype=dt, fused=fu, name="down4")(p4, train)
        x = C2f(c[4], d[3], shortcut=True, dtype=dt, fused=fu, name="c2f4")(x, train)
        p5 = SPPF(c[4], 5, dtype=dt, fused=fu, name="sppf")(x, train)
        return p3, p4, p5


class PANNeck(nn.Module):
    """Path-aggregation neck: top-down then bottom-up feature fusion."""

    cfg: DetectorConfig
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        p3, p4, p5 = feats
        c = self.cfg.channels
        # neck C2f repeats mirror the first backbone stage's scaled depth
        n = self.cfg.depths[0]
        # yolo_plus runs residual bottlenecks in the neck too (its YAMLs
        # pass C2f [..., True] everywhere); stock v8 uses False here
        sc = self.cfg.neck_shortcut
        dt, fu = self.dtype, self.fused

        # top-down
        t4 = jnp.concatenate([upsample2x_nearest(p5), p4], axis=-1)
        t4 = C2f(c[3], n, shortcut=sc, dtype=dt, fused=fu, name="td_p4")(t4, train)
        t3 = jnp.concatenate([upsample2x_nearest(t4), p3], axis=-1)
        n3 = C2f(c[2], n, shortcut=sc, dtype=dt, fused=fu, name="td_p3")(t3, train)

        # bottom-up (down-conv widths are config: v2 follows the stock-v8
        # pattern, v1's YAML widens them to the next stage — core/types.py)
        dn3, dn4 = self.cfg.neck_down_channels
        b4 = ConvBN(dn3, 3, 2, dtype=dt, fused=fu, name="bu_down3")(n3, train)
        b4 = jnp.concatenate([b4, t4], axis=-1)
        n4 = C2f(c[3], n, shortcut=sc, dtype=dt, fused=fu, name="bu_p4")(b4, train)
        b5 = ConvBN(dn4, 3, 2, dtype=dt, fused=fu, name="bu_down4")(n4, train)
        b5 = jnp.concatenate([b5, p5], axis=-1)
        n5 = C2f(c[4], n, shortcut=sc, dtype=dt, fused=fu, name="bu_p5")(b5, train)
        return n3, n4, n5


class DetectHead(nn.Module):
    """Decoupled anchor-free head: per-level DFL box + class branches."""

    cfg: DetectorConfig
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        feats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dt, fu = self.dtype, self.fused
        c_reg = cfg.reg_channels
        c_cls = cfg.cls_channels

        reg_out, cls_out = [], []
        for i, f in enumerate(feats):
            r = ConvBN(c_reg, 3, dtype=dt, fused=fu, name=f"reg{i}_cv1")(f, train)
            r = ConvBN(c_reg, 3, dtype=dt, fused=fu, name=f"reg{i}_cv2")(r, train)
            r = nn.Conv(
                4 * cfg.reg_max, (1, 1), dtype=dt, name=f"reg{i}_out"
            )(r)
            k = ConvBN(c_cls, 3, dtype=dt, fused=fu, name=f"cls{i}_cv1")(f, train)
            k = ConvBN(c_cls, 3, dtype=dt, fused=fu, name=f"cls{i}_cv2")(k, train)
            k = nn.Conv(cfg.num_classes, (1, 1), dtype=dt, name=f"cls{i}_out")(k)
            b = f.shape[0]
            reg_out.append(r.reshape(b, -1, 4 * cfg.reg_max))
            cls_out.append(k.reshape(b, -1, cfg.num_classes))

        return {
            # raw logits in compute dtype; decode/loss upcast at their
            # reductions (a (B, 8400, 64) float32 materialisation costs more
            # HBM traffic than the whole backbone)
            "reg": jnp.concatenate(reg_out, axis=1),
            "cls": jnp.concatenate(cls_out, axis=1),
        }


class YoloLitePi(nn.Module):
    """Full detector: backbone + PAN neck + decoupled DFL head.

    Input: (B, S, S, 3) float32/bfloat16, already letterboxed and scaled to
    [0, 1] (the reference normalises by 1/255 — e2e.py:233-238).
    Output: dict with ``reg`` (B, A, 4*reg_max) and ``cls`` (B, A, nc) raw
    logits, A = 8,400 at S = 640.
    """

    cfg: DetectorConfig
    dtype: jnp.dtype = jnp.float32
    # deploy form: BN folded into biased convs (weights/fold_bn.py); exact
    # inference algebra of the unfused model, minus one elementwise HBM
    # pass per ConvBN
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        from_stem: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        feats = Backbone(
            self.cfg, self.dtype, self.fused, name="backbone"
        )(x, train, from_stem)
        feats = PANNeck(self.cfg, self.dtype, self.fused, name="neck")(feats, train)
        return DetectHead(self.cfg, self.dtype, self.fused, name="head")(feats, train)
