"""Typed configuration for the framework.

The reference configures its detector through Ultralytics YAML dicts
(reference: train_model/train-yolo-custom-tt100k.ipynb cells 28/30) and its
pipeline through per-script argparse flags (reference: src/tt100k/pipeline/
e2e.py:1014-1050).  Here both collapse into frozen dataclasses: one typed
config drives model construction, the fused pipeline, the eval harness and the
CLI, so every entry point agrees on shapes and thresholds.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of ``divisor``.

    Matches the channel rounding the reference's exporter applied: the shipped
    yolo_plus_v2 graph has a 16-channel stem because 48 * 0.25 = 12 rounds up
    to 16 (reference: model.ncnn.param:4 conv 0=16).
    """
    return int(math.ceil(x / divisor) * divisor)


def scale_depth(n: int, depth: float) -> int:
    """Scale a block-repeat count, never below one repeat."""
    return max(round(n * depth), 1)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Architecture hyper-parameters for the YOLO-LitePi detector family.

    ``base_channels`` are the pre-scale stage widths (stem..P5) and
    ``base_depths`` the pre-scale C2f repeat counts, mirroring how the
    reference's YAML generator parameterises variants (reference:
    train_model/revision-ablation-study.ipynb cell 6).  Effective widths are
    ``make_divisible(base * width)``.

    Note the exported reference graphs use ``reg_max=16`` even though the YAML
    asked for 8 — Ultralytics ignored the top-level key (reference:
    model.ncnn.param:188-189, split 64/1).  We default to 16 for weight parity.
    """

    name: str = "yolo_plus_v2"
    num_classes: int = 1
    base_channels: Tuple[int, ...] = (48, 96, 192, 384, 768)
    base_depths: Tuple[int, ...] = (3, 6, 6, 3)
    width: float = 0.25
    depth: float = 0.33
    reg_max: int = 16
    input_size: int = 640
    strides: Tuple[int, ...] = (8, 16, 32)
    # PAN bottom-up down-conv widths (pre-scale).  None = the stock YOLOv8
    # pattern (base P3, P4) that yolo_plus_v2's YAML follows; yolo_plus_v1's
    # YAML instead widens each down conv to the NEXT stage width
    # ([256, 512] on its [32..512] base — train-yolo-custom-tt100k.ipynb
    # cell 28 head rows 16/19; confirmed by the surviving vntsr export:
    # yolo_plus.onnx model.16 (64,32,3,3) / model.19 (128,64,3,3)).
    neck_down_base: Optional[Tuple[int, int]] = None
    # Both yolo_plus YAMLs pass ``C2f [..., True]`` in the NECK too
    # (train-yolo-custom-tt100k.ipynb cells 28/30) — residual bottlenecks
    # everywhere, unlike stock YOLOv8 whose head C2fs omit the shortcut.
    # Verified against the real vntsr export: without it, neck activations
    # diverge from the NCNN graph interpreter by O(1) while the backbone
    # matches to 1e-5 (tests/test_ncnn_import.py differential).
    neck_shortcut: bool = True

    @property
    def channels(self) -> Tuple[int, ...]:
        return tuple(make_divisible(c * self.width) for c in self.base_channels)

    @property
    def depths(self) -> Tuple[int, ...]:
        return tuple(scale_depth(n, self.depth) for n in self.base_depths)

    @property
    def num_anchors(self) -> int:
        return sum((self.input_size // s) ** 2 for s in self.strides)

    @property
    def reg_channels(self) -> int:
        """Width of the Detect head's box branch: max(16, P3/4, 4*reg_max)."""
        return max(16, self.channels[2] // 4, 4 * self.reg_max)

    @property
    def cls_channels(self) -> int:
        """Width of the Detect head's class branch: max(P3, min(nc, 100))."""
        return max(self.channels[2], min(self.num_classes, 100))

    @property
    def neck_down_channels(self) -> Tuple[int, int]:
        """Scaled widths of the two PAN bottom-up down convs."""
        base = self.neck_down_base or (
            self.base_channels[2], self.base_channels[3]
        )
        return tuple(make_divisible(c * self.width) for c in base)


# The shipped TT100K detector: stem 16 -> 24 -> 48 -> 96 -> 192, C2f x(1,2,2,1)
# (reference: src/tt100k/convert/model/yolo_plus/yolo_plus_ncnn_model/
# model.ncnn.param:3-208; ~1.8M params / 5.2 GFLOPs per README.md:14).
YOLO_PLUS_V2 = DetectorConfig(name="yolo_plus_v2")

# The shipped VN-Signs detector: half width (stem 8, ~0.97M params) and a
# slightly different PAN: its YAML widens the bottom-up down convs to the
# next stage width (reference: train-yolo-custom-tt100k.ipynb cell 28 head
# rows 16/19 — Conv[256]/Conv[512]; src/vntsr/convert/model/yolo_plus/
# yolo_plus_ncnn_model/model.ncnn.param:2, metadata.yaml "YOLO_plus_v1").
YOLO_PLUS_V1 = DetectorConfig(
    name="yolo_plus_v1",
    base_channels=(32, 64, 128, 256, 512),
    neck_down_base=(256, 512),
)

# Stock YOLOv8n widths for baseline-parity runs (reference README.md:40).
# Stock v8 necks run plain (non-residual) C2f bottlenecks, unlike yolo_plus.
YOLOV8N = DetectorConfig(
    name="yolov8n",
    base_channels=(64, 128, 256, 512, 1024),
    neck_shortcut=False,
)

# Dataset presets: classifier crop-normalisation stats + class counts +
# the detector each tree ships (reference: tt100k uses scalar 0.18/0.34 and
# yolo_plus_v2 with 91 crop classes, e2e.py:369/1019; vntsr uses per-channel
# stats from dataset_stats.npz and yolo_plus_v1 with 49 classes —
# train-model-tsr-vntsr.ipynb cell 4 output: mean [0.4281, 0.3768, 0.4426],
# std [0.1980, 0.1813, 0.1937]).
DATASET_PRESETS = {
    "tt100k": {
        "num_classes": 91,
        "detector_variant": "yolo_plus_v2",
        "cls_mean": (0.18, 0.18, 0.18),
        "cls_std": (0.34, 0.34, 0.34),
    },
    "vntsr": {
        "num_classes": 49,
        "detector_variant": "yolo_plus_v1",
        "cls_mean": (0.4280886, 0.37681347, 0.442565),
        "cls_std": (0.1980449, 0.18132778, 0.19366477),
    },
}


def ablation_configs(
    width_scales=(0.5, 0.75, 1.0),
    depth_scales=(0.33,),
    extra=((0.75, 0.67),),
    num_classes: int = 1,
) -> Tuple[DetectorConfig, ...]:
    """Width/depth ablation grid, mirroring the reference's config generator
    (reference: train_model/revision-ablation-study.ipynb cell 6 — variants
    w in {0.5, 0.75, 1.0} x d 0.33 plus (0.75, 0.67); "YOLO-LitePi" is the
    w0.75 / d0.33 point).

    Unlike the reference run — where Ultralytics ignored the generator's
    ``width_multiple`` and trained ~8x larger models (SURVEY §6 footnote) —
    these configs actually apply the scales.
    """
    combos = [(w, d) for d in depth_scales for w in width_scales]
    combos += [c for c in extra if c not in combos]
    # variant w scales the v8 base stage widths (w=0.75 reproduces the
    # shipped yolo_plus_v2 base of 48/96/192/384/768), then the standard
    # 0.25 width multiple applies
    return tuple(
        DetectorConfig(
            name=f"ablation_w{w:g}_d{d:g}",
            num_classes=num_classes,
            base_channels=tuple(
                int(round(c * w)) for c in (64, 128, 256, 512, 1024)
            ),
            width=0.25,
            depth=d,
        )
        for w, d in combos
    )


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    """Fixed-shape postprocess contract.

    The reference filters by confidence then runs exact greedy per-class NMS on
    a variable number of candidates (reference: e2e.py:240-296).  On TPU the
    candidate set must be static: we keep the top ``max_candidates`` scores,
    suppress with a masked O(k^2) pass, and emit exactly ``max_detections``
    padded slots per image.
    """

    conf_threshold: float = 0.25
    iou_threshold: float = 0.45
    max_candidates: int = 512
    max_detections: int = 64
    min_area: float = 50.0  # pixel-area floor for ROI crops (e2e.py --min_area)
    # Budgets for the low-conf mAP pass.  The reference NMS sees *every*
    # candidate above yolo_conf=0.001, unbounded (e2e.py:240-296); a serving
    # budget of 512/64 clips the PR-curve tail on dense scenes and deflates
    # recall.  The eval pass therefore decodes candidates on device and runs
    # the exact unbounded numpy NMS on the host (in original-image space,
    # matching the reference's suppression order).  0 = unbounded: all
    # anchors / all survivors.
    eval_max_candidates: int = 0
    eval_max_detections: int = 0


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end two-stage pipeline configuration.

    Mirrors the reference CLI surface (e2e.py:1014-1050): detector input 640,
    classifier input 64, batch size, and the two-pass conf protocol
    (``benchmark_conf`` for timed runs, ``yolo_conf`` for the low-conf mAP
    pass).
    """

    detector: DetectorConfig = YOLO_PLUS_V2
    nms: NMSConfig = NMSConfig()
    classifier_arch: str = "shufflenetv2"
    num_classifier_classes: int = 91  # TT100K crops; VN-Signs uses 49
    det_input_size: int = 640
    cls_input_size: int = 64
    batch_size: int = 8
    yolo_conf: float = 0.001
    benchmark_conf: float = 0.25
    # Dataset crop-normalisation stats.  The reference e2e path uses scalar
    # mean/std 0.18/0.34 computed from the TT100K crop set (e2e.py:369).
    cls_mean: Tuple[float, float, float] = (0.18, 0.18, 0.18)
    cls_std: Tuple[float, float, float] = (0.34, 0.34, 0.34)
    compute_dtype: str = "bfloat16"  # MXU-native; params stay float32
    # Fused-path ROI crop implementation (all share sampling semantics;
    # chosen by on-chip measurement — see ops/roi.py and ops/pallas_roi.py
    # docstrings for the numbers):
    #   "dense"    — hat-matmul crop over the full frame (default: exact for
    #                every box size, ~70% MFU, fastest measured);
    #   "windowed" — XLA windowed crop (measured dead end: gather-lowered);
    #   "pallas"   — DMA-staged windowed kernel (bit-exact below the window,
    #                latency-bound at ~1.2 us/crop; ~equal to dense).
    roi_impl: str = "dense"
    # window size for the "windowed" impl (the pallas kernel uses its own
    # static 128x256 slab)
    roi_window: int = 128
    # Images vectorised per sequential step of the dense ROI crop.  At the
    # serving crop budget (8 slots/frame) the per-image loop overhead
    # dominates the shrunken matmuls: chunk 8 measured 0.99 vs 1.45 ms at
    # B=128 on-chip (round 5, bit-parity checked); chunk 32 re-inflates the
    # bounded intermediate and loses (2.2 ms).  Non-divisors of the batch
    # fall back to the largest divisor, so the default is safe at any B.
    roi_chunk: int = 8
    # Candidate top-k selector for the fused/staged detect paths: "exact"
    # (sort-based jax.lax.top_k — bit-reproducible, the parity/eval
    # default) or "approx" (TPU partial-reduce jax.lax.approx_max_k,
    # recall_target 0.95 — measured 0.12 vs 0.31 ms at B=128/A=8400/K=64;
    # retains ~0.996 of candidates that clear a conf threshold, losing
    # only the all-tied background tail).  A serving knob in the same
    # spirit as the crop/cls budgets.
    candidate_selector: str = "exact"
    # Colour order of HOST-provided frames/crops.  Model compute is always
    # RGB (the reference converts BGR->RGB before both stages — e2e.py:224,
    # :385); "bgr" makes the jitted programs reverse the channel axis at
    # entry, which XLA fuses into the normalise (zero extra HBM traffic —
    # cheaper than the reference's host cvtColor).  The apps/CLIs pass
    # "bgr" because cv2/native-loader buffers are BGR; the default "rgb"
    # means frames are already in model order (no flip).
    input_color: str = "rgb"
    # Per-frame crop budget for the fused program: keep only the top
    # ``crop_det_budget`` score-descending NMS slots per frame BEFORE the
    # ROI crop (0 = keep all max_detections slots).  The dense crop costs
    # one hat-matmul against the full frame per slot, so the crop stage
    # shrinks proportionally; outputs then carry crop_det_budget slots.
    # Exact whenever every frame has <= budget valid detections (same
    # capping spirit as max_detections, applied one stage later); unlike
    # cls_crop_budget the slice is per-frame and inserts no cross-batch
    # collectives under a data-sharded mesh.
    crop_det_budget: int = 0
    # Global classifier budget for the fused program: classify only the
    # top-``cls_crop_budget`` crops BY DETECTION SCORE across the whole
    # batch (0 = classify every B x max_detections slot).  The per-frame
    # NMS budget must cover the densest frame, but at serving conf the
    # MEAN detections/frame is far below max_detections, so most slots are
    # masked padding; compacting before the classifier skips that padding.
    # Exact whenever the batch's valid-detection count fits the budget;
    # beyond it the lowest-scoring detections are dropped (same capping
    # spirit as max_detections, and unlike the reference's unbounded host
    # loop — documented serving trade).  Scores, boxes and the valid mask
    # of surviving slots are untouched.
    cls_crop_budget: int = 0
