"""The two-stage detect -> crop -> classify pipeline as XLA programs.

The reference orchestrates this per image on the host: NCNN detect, numpy
postprocess, Python ROI loop, batched torch classify (reference:
HybridPipeline.run e2e.py:443-531).  Here the same dataflow exists in two
forms:

* **fused program** (:meth:`TwoStagePipeline.run_fused`) — one jitted XLA
  program per frame resolution: letterbox -> normalize -> detector -> DFL
  decode -> NMS -> un-letterbox -> min-area mask -> ROI crop -> classifier.
  A frame never round-trips to the host between stages; the batch dimension
  is the throughput lever (this is the serving/bench path, and the reason a
  13 FPS Pi pipeline becomes a >1k FPS TPU program).

* **staged programs** (:meth:`detect` / :meth:`classify`) — the detector and
  classifier as separate jitted calls with host ROI extraction in between,
  mirroring the reference's structure exactly.  Used by the eval CLI for
  bit-faithful parity (host cv2 letterbox, reference crop semantics) and for
  per-stage latency reporting (PipelineMetrics).

All shapes are static: NMS emits ``max_detections`` padded slots, the
classifier always sees ``B * max_detections`` crops with masking.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from litepi_tpu.core.types import PipelineConfig
from litepi_tpu.models import YoloLitePi, build_classifier
from litepi_tpu.ops.anchors import make_anchors
from litepi_tpu.ops.boxes import box_area, clip_boxes
from litepi_tpu.ops.dfl import decode_candidates
from litepi_tpu.ops.letterbox import letterbox_device, letterbox_params
from litepi_tpu.ops.nms import nms_sorted
from litepi_tpu.ops.roi import crop_and_resize, crop_and_resize_windowed


class TwoStagePipeline:
    """Holds models + params and compiles the pipeline programs.

    Parameters come in as Flax variable dicts (converted via
    :mod:`litepi_tpu.weights` or freshly trained).  ``conf_threshold`` is a
    per-call argument so the reference's two-pass protocol (benchmark_conf
    0.25 vs yolo_conf 0.001 — e2e.py:971-992) reuses one compiled program.
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        det_vars: Any,
        cls_vars: Any,
        dtype: jnp.dtype = jnp.float32,
        det_model: Any = None,
        candidate_decoder: Any = None,
        candidate_capacity: Optional[int] = None,
    ) -> None:
        self.cfg = cfg
        # any detector with the {reg, cls} output contract plugs in
        # (YoloLitePi family, YoloV11, ...); models with a different head
        # (e.g. anchor-based YoloV5) supply ``candidate_decoder(out, k) ->
        # (boxes, scores, class_ids)`` returning top-k score-descending
        # candidates in input-pixel space
        if det_model is None:
            # serving runs the deploy form: BN folded into biased convs
            # (exact inference algebra; kills one elementwise HBM pass per
            # ConvBN — see weights/fold_bn.py).  Injected custom models are
            # used as-is with their own variables.
            from litepi_tpu.weights.fold_bn import fold_detector_pipeline_vars

            det_vars, fused = fold_detector_pipeline_vars(det_vars)
            self.det_model = YoloLitePi(cfg.detector, dtype=dtype, fused=fused)
            # deploy-form YoloLitePi: the fused program folds the 1/255
            # scale and BGR->RGB flip into the stem kernel at trace time
            # (weights/fold_bn.py::fold_stem_input) and feeds raw 0-255
            # letterbox pixels — saves the full-canvas elementwise HBM
            # passes between letterbox and stem
            self._stem_input_foldable = fused
        else:
            self.det_model = det_model
            self._stem_input_foldable = False
        self._candidate_decoder = candidate_decoder
        # Pin params to the default (accelerator) device NOW.  fast_init
        # leaves them COMMITTED to the host CPU device; passed as jit
        # arguments they would otherwise re-upload ~13 MB on EVERY dispatch —
        # measured 3x the whole fused step through the TPU relay (round 2).
        # (A bare device_put is a no-op for committed arrays — the target
        # must be explicit.)
        from litepi_tpu.models.registry import CLASSIFIER_BN_EPS
        from litepi_tpu.weights.fold_bn import fold_pipeline_vars

        cls_vars, cls_fused = fold_pipeline_vars(
            cls_vars, eps=CLASSIFIER_BN_EPS
        )
        target = jax.local_devices()[0]
        det_vars = jax.device_put(det_vars, target)
        cls_vars = jax.device_put(cls_vars, target)
        self.cls_model = build_classifier(
            cfg.classifier_arch,
            cfg.num_classifier_classes,
            dtype=dtype,
            fused=cls_fused,
        )
        self.det_vars = det_vars
        self.cls_vars = cls_vars
        pts, strides = make_anchors(cfg.det_input_size, cfg.detector.strides)
        self._anchors = jnp.asarray(pts)
        self._strides = jnp.asarray(strides)
        # the "unbounded" eval pass (eval_max_candidates=0) means ALL of the
        # model's predictions; for candidate_decoder models the count
        # differs from the anchor-free grid (e.g. anchor-based YOLOv5 emits
        # 3x more), so the decoder's capacity must be declared explicitly —
        # clamping to the anchor-free 8400 would silently clip its PR tail
        self._candidate_capacity = int(
            candidate_capacity
            if candidate_capacity is not None
            else self._anchors.shape[0]
        )
        self._mean = jnp.asarray(cfg.cls_mean, jnp.float32)
        self._std = jnp.asarray(cfg.cls_std, jnp.float32)

    # ------------------------------------------------------------------ #
    # stage programs                                                      #
    # ------------------------------------------------------------------ #

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _detect_jit(
        self,
        det_vars: Any,
        canvas01: jnp.ndarray,
        max_candidates: Optional[int] = None,
        raw_input: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """canvas01: (B, S, S, 3) in [0, 1].  Returns the top
        ``max_candidates`` (static; defaults to the serving budget
        ``cfg.nms.max_candidates``) score-descending candidates per image:
        (boxes (B, K, 4) xyxy in letterbox space, scores (B, K),
        class_ids (B, K)).

        Layout note: scores are reduced and top-k'd over the full anchor set
        *before* any box math, so the only full-size (A,) tensors are the
        head logits — an (A, 4) box tensor with a minor dim of 4 wastes 97%
        of each TPU vector register and measured 3x the whole backbone's
        runtime.  All box decode happens on the K candidates only.
        """
        if self.cfg.input_color == "bgr" and not raw_input:
            # host buffers are cv2-BGR; compute is RGB (reference converts
            # before the detector, e2e.py:224-226); with ``raw_input`` the
            # flip (and the 1/255 scale) live in the stem kernel instead
            canvas01 = canvas01[..., ::-1]
        out = self.det_model.apply(det_vars, canvas01, train=False)
        k = max_candidates or self.cfg.nms.max_candidates
        if self._candidate_decoder is not None:
            return self._candidate_decoder(out, k)
        return decode_candidates(
            out, self._anchors, self._strides, self.cfg.detector.reg_max, k,
            self.cfg.candidate_selector,
        )

    def detect(
        self,
        canvas01: np.ndarray,
        conf_threshold: Optional[float] = None,
    ) -> Dict[str, np.ndarray]:
        """Detector stage on pre-letterboxed input: forward + decode + NMS.

        Mirrors ``NCNNDetector.detect`` (e2e.py:298-316) but batched and
        fixed-shape.  Boxes return in 640-letterbox space; the caller
        un-letterboxes with its own per-image geometry (e2e.py:266-278).
        """
        conf = self.cfg.benchmark_conf if conf_threshold is None else conf_threshold
        boxes, scores, class_ids = self._detect_jit(self.det_vars, canvas01)
        b, s, c, v = self._nms_jit(
            boxes,
            scores,
            class_ids,
            jnp.float32(conf),
            self.cfg.nms.max_detections,
        )
        return {"boxes": b, "scores": s, "class_ids": c, "valid": v}

    def detect_candidates(
        self, canvas01: np.ndarray, max_candidates: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decoded score-descending candidates with NO suppression, for the
        host-NMS eval path (the reference suppresses unbounded candidate
        sets in original-image space, e2e.py:240-296 — exact parity needs
        host NMS, so the device stops at decode here).

        Returns (boxes (B, K, 4) letterbox-space xyxy, scores (B, K),
        class_ids (B, K)) with K = ``max_candidates`` (default: the eval
        budget, 0 meaning the full anchor set).
        """
        k = max_candidates or self.cfg.nms.eval_max_candidates
        cap = self._candidate_capacity
        k = min(k, cap) if k else cap
        return self._detect_jit(self.det_vars, canvas01, k)

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _nms_jit(self, boxes, scores, class_ids, conf, max_detections):
        return nms_sorted(
            boxes,
            scores,
            class_ids,
            conf,
            self.cfg.nms.iou_threshold,
            max_detections,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _classify_jit(self, cls_vars: Any, crops01: jnp.ndarray) -> jnp.ndarray:
        """crops01: (N, c, c, 3) in [0, 1] -> (N, num_classes) probabilities."""
        if self.cfg.input_color == "bgr":
            # classifier also computes in RGB (reference predict_batch
            # converts each crop, e2e.py:385)
            crops01 = crops01[..., ::-1]
        x = (crops01 - self._mean) / self._std
        logits = self.cls_model.apply(cls_vars, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    def classify(self, crops01: np.ndarray) -> np.ndarray:
        """Classifier stage (reference: PyTorchClassifier.predict_batch
        e2e.py:377-396), already normalised to [0, 1]."""
        return self._classify_jit(self.cls_vars, crops01)

    # ------------------------------------------------------------------ #
    # fused program                                                       #
    # ------------------------------------------------------------------ #

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _fused_jit(
        self,
        det_vars: Any,
        cls_vars: Any,
        frame_hw: Tuple[int, int],
        conf_threshold: jnp.ndarray,
        frames: jnp.ndarray,
        area_scale: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        nms_cfg = cfg.nms
        h, w = frame_hw
        size = cfg.det_input_size
        ratio, dw, dh, _, _ = letterbox_params(h, w, size)

        # A fused uint8->stem Pallas kernel was built and golden-tested
        # (ops/pallas_stem.py) but is NOT wired here: Mosaic cannot lower
        # the interleaved-NHWC lane regrouping it needs (round-3 measured
        # dead end — see the kernel's docstring for the full account).
        canvas = letterbox_device(frames, size, self.det_model.dtype)
        if self._stem_input_foldable:
            from litepi_tpu.weights.fold_bn import fold_stem_input

            # trace-time kernel rewrite (a few ops on a (3,3,3,c0) tensor —
            # free next to one canvas pass); the detector then consumes the
            # raw 0-255 canvas directly
            raw_vars = fold_stem_input(
                det_vars, 1.0 / 255.0, self.cfg.input_color == "bgr"
            )
            boxes, scores, class_ids = self._detect_jit(
                raw_vars, canvas, None, True
            )
        else:
            boxes, scores, class_ids = self._detect_jit(
                det_vars, canvas * (1.0 / 255.0)
            )
        b, s, c, v = nms_sorted(
            boxes,
            scores,
            class_ids,
            conf_threshold,
            nms_cfg.iou_threshold,
            nms_cfg.max_detections,
        )
        if cfg.crop_det_budget and cfg.crop_det_budget < nms_cfg.max_detections:
            # per-frame crop budget: nms_sorted slots are score-descending,
            # so keeping the top ``crop_det_budget`` per frame is a static
            # slice — every stage downstream (unmap, area filter, ROI crop,
            # classifier) shrinks with it.  The dense ROI crop pays one
            # hat-matmul against the full frame PER SLOT, so this cuts its
            # cost by max_detections/crop_det_budget.  Mesh-safe: the slice
            # is per-frame, no cross-batch collective under data sharding.
            d2 = cfg.crop_det_budget
            b, s, c, v = b[..., :d2, :], s[..., :d2], c[..., :d2], v[..., :d2]
        # map to original pixels (static geometry: one program per resolution)
        shift = jnp.asarray([dw, dh, dw, dh], jnp.float32)
        orig_boxes = clip_boxes((b - shift) / ratio, w, h)
        # the reference drops ROIs below --min_area pixels (e2e.py:459-485),
        # measured in ORIGINAL-image pixels.  When the caller feeds
        # pre-letterboxed canvases (native loader path), box areas here are
        # canvas-space and shrink by the letterbox ratio squared;
        # ``area_scale`` (B,) carries 1/ratio^2 per frame so the floor stays
        # in original pixels.
        area = box_area(orig_boxes)
        if area_scale is not None:
            area = area * area_scale[:, None]
        v = v & (area >= nms_cfg.min_area)

        # frames pass as uint8: the crop casts to its compute dtype lazily
        # (every value 0-255 is exact in bf16), so no full-resolution float
        # copy of the batch ever materialises in HBM (was ~630 MB at B=128)
        if cfg.roi_impl == "pallas":
            from litepi_tpu.ops.pallas_roi import pallas_crop_and_resize

            # interpreter mode off-TPU so the same config is testable on
            # the CPU suite (Mosaic kernels only compile for real TPUs);
            # the kernel computes in the pipeline's dtype like the others
            crops = pallas_crop_and_resize(
                frames,
                orig_boxes,
                v,
                cfg.cls_input_size,
                jax.default_backend() != "tpu",
                self.det_model.dtype,
            )
        elif cfg.roi_impl == "windowed":
            crops = crop_and_resize_windowed(
                frames,
                orig_boxes,
                v,
                cfg.cls_input_size,
                self.det_model.dtype,
                cfg.roi_window,
            )
        else:
            crops = crop_and_resize(
                frames,
                orig_boxes,
                v,
                cfg.cls_input_size,
                self.det_model.dtype,
                cfg.roi_chunk,
            )
        crops = crops * (1.0 / 255.0)
        n, d = crops.shape[0], crops.shape[1]
        flat = crops.reshape(n * d, *crops.shape[2:])
        budget = cfg.cls_crop_budget
        if budget and budget < n * d:
            # global compaction: rank every slot by detection score (invalid
            # slots sink to -1), classify only the top ``budget`` crops, and
            # scatter the probabilities back.  The gather is ~24 KB/crop;
            # the classifier work drops by (n*d)/budget.
            flat_rank = jnp.where(v, s, -1.0).reshape(n * d)
            _, sel = jax.lax.top_k(flat_rank, budget)
            sel_probs = self._classify_jit(cls_vars, flat[sel])
            probs = (
                jnp.zeros((n * d, sel_probs.shape[-1]), sel_probs.dtype)
                .at[sel]
                .set(sel_probs)
                .reshape(n, d, -1)
            )
            # detections beyond the budget lose their classification slot
            kept = (
                jnp.zeros((n * d,), bool).at[sel].set(True).reshape(n, d)
            )
            v = v & kept
        else:
            probs = self._classify_jit(cls_vars, flat).reshape(n, d, -1)
        return {
            "boxes": orig_boxes,
            "det_scores": s,
            "det_class_ids": c,
            "valid": v,
            "cls_probs": probs,
            "cls_labels": probs.argmax(axis=-1).astype(jnp.int32),
            "cls_scores": probs.max(axis=-1),
        }

    def run_fused(
        self,
        frames: np.ndarray,
        conf_threshold: Optional[float] = None,
        area_scale: Optional[np.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full two-stage pipeline on raw same-resolution frames.

        frames: (B, H, W, 3) uint8 in ``cfg.input_color`` order ("bgr" for
        cv2/native-loader frames — the programs flip to the RGB compute
        convention in-graph).  Returns fixed-shape padded outputs; ``valid`` masks
        real detections.  ``area_scale`` (B,): per-frame multiplier applied
        to box areas before the min-area floor — pass 1/letterbox_ratio^2
        when frames are pre-letterboxed canvases of larger originals.
        """
        conf = self.cfg.benchmark_conf if conf_threshold is None else conf_threshold
        hw = (int(frames.shape[1]), int(frames.shape[2]))
        return self._fused_jit(
            self.det_vars,
            self.cls_vars,
            hw,
            jnp.float32(conf),
            frames,
            None if area_scale is None else jnp.asarray(area_scale, jnp.float32),
        )

    # ------------------------------------------------------------------ #
    # construction helpers                                                #
    # ------------------------------------------------------------------ #

    @classmethod
    def initialize(
        cls,
        cfg: PipelineConfig,
        seed: int = 0,
        dtype: jnp.dtype = jnp.float32,
    ) -> "TwoStagePipeline":
        """Build a pipeline with freshly initialised (untrained) params —
        used by benchmarks, shape tests and as the training starting point."""
        from litepi_tpu.models.init_utils import fast_init

        det_model = YoloLitePi(cfg.detector, dtype=dtype)
        cls_model = build_classifier(
            cfg.classifier_arch, cfg.num_classifier_classes, dtype=dtype
        )
        det_vars = fast_init(det_model, seed=seed)
        cls_vars = fast_init(cls_model, seed=seed + 1, spatial=cfg.cls_input_size)
        return cls(cfg, det_vars, cls_vars, dtype=dtype)
