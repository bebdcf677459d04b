"""Composition parity: the reference's WHOLE per-image flow vs this repo.

Every stage (letterbox, decode, NMS, crop geometry, classifier contract) is
unit-parity-tested elsewhere; this file tests the *composition*.  Side A is
a fresh test-local transcription of the reference's `HybridPipeline.run`
orchestration (e2e.py:443-531) whose detector backend is the repo's own
NCNN interpreter executing the REAL shipped vntsr v1 `.param`/`.bin`
(NCNNDetector.detect, e2e.py:298-316: letterbox -> BGR2RGB -> net ->
postprocess e2e.py:240-296).  Side B is the production path —
`PipelineEvaluator` over a `TwoStagePipeline` built from the same weights
via `convert_detector_ncnn` — driven on the same deterministic synthetic
images (varied sizes, exercising letterbox unmapping).  Both sides share
one set of classifier variables.

Deviations from the reference, by necessity, mirrored on BOTH sides:
* crops resize with cv2 (the reference's e2e_optimize.py:393 variant; its
  e2e.py uses PIL, unavailable-equivalent here and already documented as
  the repo's chosen crop contract);
* the classifier is flax with fresh seeded weights (every trained
  classifier binary is stripped upstream — .MISSING_LARGE_BLOBS).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF = "/root/reference/src"
V1_DIR = f"{REF}/vntsr/convert/model/yolo_plus"
V1_PARAM = f"{V1_DIR}/yolo_plus_ncnn_model/model.ncnn.param"
V1_BIN = f"{V1_DIR}/yolo_plus_ncnn_model/model.ncnn.bin"

needs_reference = pytest.mark.skipif(
    not os.path.exists(V1_BIN), reason="real v1 NCNN pair not present"
)

NUM_CLASSES = 12
IOU = 0.45
MIN_AREA = 50
CLS_MEAN, CLS_STD = 0.18, 0.34


# ------------------------------------------------------------------------ #
# side A: transcription of the reference flow (fresh, line-cited)          #
# ------------------------------------------------------------------------ #


def _letterbox_ref(img, new_shape=640, color=(114, 114, 114)):
    """Transcribed reference letterbox (e2e.py:66-87)."""
    import cv2

    shape = img.shape[:2]
    r = min(new_shape / shape[0], new_shape / shape[1])
    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape - new_unpad[0], new_shape - new_unpad[1]
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color
    )
    return img, r, (dw, dh)


def _nms_ref(boxes, scores, iou_threshold=0.45):
    """Transcribed reference nms_numpy (e2e.py:89-119)."""
    if len(boxes) == 0:
        return []
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1)
        h = np.maximum(0.0, yy2 - yy1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-6)
        inds = np.where(iou <= iou_threshold)[0]
        order = order[inds + 1]
    return keep


def _detect_ref(layers, image_bgr, conf_threshold, iou_threshold):
    """Transcribed NCNNDetector.detect (e2e.py:222-316): the repo's NCNN
    interpreter stands in for `ncnn.Net` executing the same graph."""
    import cv2

    from litepi_tpu.weights.ncnn_import import run_ncnn_graph

    orig_h, orig_w = image_bgr.shape[:2]
    img_resized, ratio, (dw, dh) = _letterbox_ref(image_bgr)
    img_rgb = cv2.cvtColor(img_resized, cv2.COLOR_BGR2RGB)
    # ncnn.Mat.from_pixels + substract_mean_normalize([0]*3, [1/255]*3)
    chw = img_rgb.transpose(2, 0, 1).astype(np.float32) / 255.0
    output_array = np.asarray(run_ncnn_graph(layers, chw), np.float32)

    # postprocess (e2e.py:240-296)
    if output_array.ndim == 2:
        output_array = np.expand_dims(output_array, axis=0)
    if output_array.shape[-1] == 84:
        output_array = output_array.transpose(0, 2, 1)
    predictions = output_array[0]
    boxes = predictions[:4].T
    scores = predictions[4:].T
    class_scores = np.max(scores, axis=1)
    class_ids = np.argmax(scores, axis=1)
    mask = class_scores > conf_threshold
    boxes = boxes[mask]
    scores = class_scores[mask]
    class_ids = class_ids[mask]
    if len(boxes) == 0:
        return np.empty((0, 4)), np.empty((0,)), np.empty((0,))
    xc, yc, bw, bh = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    boxes_xyxy = np.stack(
        [xc - bw / 2, yc - bh / 2, xc + bw / 2, yc + bh / 2], axis=1
    )
    boxes_xyxy[:, [0, 2]] -= dw
    boxes_xyxy[:, [1, 3]] -= dh
    boxes_xyxy /= ratio
    boxes_xyxy[:, [0, 2]] = np.clip(boxes_xyxy[:, [0, 2]], 0, orig_w)
    boxes_xyxy[:, [1, 3]] = np.clip(boxes_xyxy[:, [1, 3]], 0, orig_h)
    nms_indices = []
    for cls in np.unique(class_ids):
        cls_mask = class_ids == cls
        keep = _nms_ref(boxes_xyxy[cls_mask], scores[cls_mask], iou_threshold)
        nms_indices.extend(np.where(cls_mask)[0][keep])
    if len(nms_indices) > 0:
        nms_indices = np.array(nms_indices)
        return boxes_xyxy[nms_indices], scores[nms_indices], class_ids[nms_indices]
    return np.empty((0, 4)), np.empty((0,)), np.empty((0,))


def _run_ref(layers, classify_rgb01, image_bgr, conf_threshold,
             iou_threshold=IOU, min_area=MIN_AREA, batch_size=8):
    """Transcribed HybridPipeline.run (e2e.py:443-531): detect -> int-ROI
    extraction + min-area -> batched classify -> result dicts.  Also
    returns the float boxes for coordinate comparison (the reference keeps
    them in `boxes` until the final astype(int))."""
    import cv2

    boxes, scores, det_classes = _detect_ref(
        layers, image_bgr, conf_threshold, iou_threshold
    )
    rois, valid_indices = [], []
    h, w = image_bgr.shape[:2]
    for idx, box in enumerate(boxes):
        x1, y1, x2, y2 = box.astype(int)
        x1, y1 = np.clip(x1, 0, w - 1), np.clip(y1, 0, h - 1)
        x2, y2 = np.clip(x2, x1 + 1, w), np.clip(y2, y1 + 1, h)
        area = (x2 - x1) * (y2 - y1)
        if area >= min_area and x2 > x1 and y2 > y1:
            rois.append(image_bgr[y1:y2, x1:x2])
            valid_indices.append(idx)
    if len(valid_indices) > 0:
        boxes = boxes[valid_indices]
        scores = scores[valid_indices]
        det_classes = det_classes[valid_indices]
    else:
        boxes = np.empty((0, 4))
        scores = np.empty((0,))
        det_classes = np.empty((0,))
    all_cls, all_probs = [], []
    for i in range(0, len(rois), batch_size):
        batch = rois[i : i + batch_size]
        # PyTorchClassifier.predict_batch (e2e.py:377-396): BGR2RGB per
        # crop, resize to 64, [0,1], Normalize(0.18, 0.34) — the resize is
        # the cv2 variant (see module docstring)
        rgb01 = np.stack(
            [
                cv2.resize(
                    cv2.cvtColor(c, cv2.COLOR_BGR2RGB), (64, 64),
                    interpolation=cv2.INTER_LINEAR,
                ).astype(np.float32)
                / 255.0
                for c in batch
            ]
        )
        probs = classify_rgb01(rgb01)
        all_cls.extend(np.argmax(probs, axis=1))
        all_probs.extend(probs)
    results = []
    for i in range(len(boxes)):
        results.append(
            {
                "bbox": tuple(boxes[i].astype(int)),
                "box_float": boxes[i].copy(),
                "det_conf": float(scores[i]),
                "cls_class": int(all_cls[i]) if i < len(all_cls) else -1,
                "cls_conf": float(np.max(all_probs[i])) if i < len(all_probs) else 0.0,
            }
        )
    return results


# ------------------------------------------------------------------------ #
# shared fixtures                                                           #
# ------------------------------------------------------------------------ #


def _synthetic_images(seed=7):
    """Deterministic structured frames at varied resolutions (distinct
    sizes per image so letterbox unmapping geometry differs every time)."""
    import cv2

    rng = np.random.default_rng(seed)
    sizes = [(480, 640), (640, 480), (320, 320), (700, 900), (360, 540), (512, 768)]
    images = []
    for h, w in sizes:
        img = np.full((h, w, 3), 0, np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        img[..., 0] = (xx * 255 // max(w, 1)).astype(np.uint8)
        img[..., 1] = (yy * 255 // max(h, 1)).astype(np.uint8)
        img[..., 2] = 96
        for _ in range(12):  # sign-like blobs
            cx, cy = rng.integers(30, w - 30), rng.integers(30, h - 30)
            r = int(rng.integers(8, 40))
            color = tuple(int(v) for v in rng.integers(0, 256, 3))
            if rng.random() < 0.5:
                cv2.circle(img, (int(cx), int(cy)), r, color, -1)
            else:
                cv2.rectangle(
                    img,
                    (int(cx - r), int(cy - r)),
                    (int(cx + r), int(cy + r)),
                    color,
                    -1,
                )
        noise = rng.integers(0, 24, (h, w, 3), dtype=np.uint8)
        images.append(
            np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        )
    return images


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from litepi_tpu.core.types import NMSConfig, PipelineConfig
    from litepi_tpu.models import build_classifier
    from litepi_tpu.models.init_utils import fast_init
    from litepi_tpu.pipeline import TwoStagePipeline
    from litepi_tpu.pipeline.evaluator import PipelineEvaluator
    from litepi_tpu.weights.ncnn_import import (
        convert_detector_ncnn,
        infer_detector_config,
        parse_ncnn_param,
    )

    layers = parse_ncnn_param(V1_PARAM)
    det_cfg = infer_detector_config(layers)
    det_vars, _ = convert_detector_ncnn(layers, V1_BIN, det_cfg)

    cls_model = build_classifier("shufflenetv2", NUM_CLASSES)
    cls_vars = fast_init(cls_model, seed=3, spatial=64)

    cfg = PipelineConfig(
        detector=det_cfg,
        nms=NMSConfig(
            max_candidates=512,
            max_detections=64,
            iou_threshold=IOU,
            min_area=MIN_AREA,
        ),
        classifier_arch="shufflenetv2",
        num_classifier_classes=NUM_CLASSES,
        det_input_size=det_cfg.input_size,
        cls_input_size=64,
        input_color="bgr",  # the evaluator is fed cv2-BGR frames
        batch_size=2,
        cls_mean=(CLS_MEAN,) * 3,
        cls_std=(CLS_STD,) * 3,
    )
    pipe = TwoStagePipeline(cfg, det_vars, cls_vars)
    evaluator = PipelineEvaluator(pipe)

    def classify_rgb01(rgb01):
        """Side A's classifier: the SAME variables, raw train-form apply
        with the reference's normalise — independent of the repo's folded
        deploy-form serving path."""
        import jax

        x = (jnp.asarray(rgb01) - CLS_MEAN) / CLS_STD
        logits = cls_model.apply(cls_vars, x, train=False)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    return layers, classify_rgb01, evaluator


@pytest.fixture(scope="module")
def side_a_eval(setup):
    """Side A's mAP-pass (conf 0.001) results for all images, computed once
    — the interpreter runs the full 206-layer graph per image."""
    layers, classify_rgb01, _ = setup
    return [
        _run_ref(layers, classify_rgb01, img, conf_threshold=0.001)
        for img in _synthetic_images()
    ]


def _match_sorted(a_boxes, b_boxes, a_aux, b_aux, atol_px):
    """Order-insensitive comparison: reference NMS regroups survivors by
    class (e2e.py:280-290) while the repo keeps candidate order, so sort
    both sides canonically before comparing."""
    assert len(a_boxes) == len(b_boxes)
    if len(a_boxes) == 0:
        return
    ka = np.lexsort((a_boxes[:, 1], a_boxes[:, 0]))
    kb = np.lexsort((b_boxes[:, 1], b_boxes[:, 0]))
    np.testing.assert_allclose(a_boxes[ka], b_boxes[kb], atol=atol_px)
    for av, bv, tol in zip(a_aux, b_aux, (1e-3, 0, 1e-3)):
        if tol == 0:
            np.testing.assert_array_equal(np.asarray(av)[ka], np.asarray(bv)[kb])
        else:
            np.testing.assert_allclose(
                np.asarray(av)[ka], np.asarray(bv)[kb], atol=tol
            )


@needs_reference
def test_full_flow_boxes_and_labels_match(setup, side_a_eval):
    """Reference-flow transcription over the interpreter vs the repo's
    evaluator: same boxes (<=1e-2 px), same det scores, same classifier
    labels and scores, per image, at the mAP operating point."""
    _, _, evaluator = setup
    images = _synthetic_images()

    res_b = evaluator.run_images(images, conf_threshold=0.001, eval_budget=True)

    total = 0
    for ra, rb in zip(side_a_eval, res_b):
        a_boxes = np.array([r["box_float"] for r in ra]).reshape(-1, 4)
        a_scores = np.array([r["det_conf"] for r in ra])
        a_labels = np.array([r["cls_class"] for r in ra])
        a_cls_conf = np.array([r["cls_conf"] for r in ra])
        total += len(a_boxes)
        assert len(a_boxes) == len(rb["boxes"]), "detection count diverged"
        _match_sorted(
            a_boxes,
            rb["boxes"],
            (a_scores, a_labels, a_cls_conf),
            (rb["det_scores"], rb["labels"], rb["cls_scores"]),
            atol_px=1e-2,
        )
    # the comparison must not be vacuous
    assert total >= 5, f"only {total} detections across the whole set"


@needs_reference
def test_full_flow_benchmark_conf_point(setup):
    """The serving operating point (benchmark_conf 0.25) through the same
    two flows on one image."""
    layers, classify_rgb01, evaluator = setup
    img = _synthetic_images()[3]
    ra = _run_ref(layers, classify_rgb01, img, conf_threshold=0.25)
    rb = evaluator.run_images([img], conf_threshold=0.25, eval_budget=True)[0]
    a_boxes = np.array([r["box_float"] for r in ra]).reshape(-1, 4)
    assert len(a_boxes) == len(rb["boxes"])
    _match_sorted(
        a_boxes,
        rb["boxes"],
        (np.array([r["det_conf"] for r in ra]),
         np.array([r["cls_class"] for r in ra]),
         np.array([r["cls_conf"] for r in ra])),
        (rb["det_scores"], rb["labels"], rb["cls_scores"]),
        atol_px=1e-2,
    )


@needs_reference
def test_full_flow_metrics_row_matches(setup, side_a_eval, tmp_path):
    """The end-of-run summary numbers: side A accumulates the reference's
    process_image protocol (int bboxes + GT int corners, e2e.py:955-1011)
    into the reference-exact metric oracle; side B is the evaluator's
    evaluate_dataset.  The comparison_summary.csv scalar row must agree to
    1e-6."""
    import cv2

    from litepi_tpu.evals.reference import evaluate_predictions_reference

    _, _, evaluator = setup
    images = _synthetic_images()
    rng = np.random.default_rng(11)

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    paths = []
    for i, img in enumerate(images):
        p = img_dir / f"im{i}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
        h, w = img.shape[:2]
        with open(lbl_dir / f"im{i}.txt", "w") as f:
            for _ in range(3):  # synthetic GT: random plausible signs
                cx, cy = rng.uniform(0.15, 0.85), rng.uniform(0.15, 0.85)
                bw, bh = rng.uniform(0.03, 0.12), rng.uniform(0.03, 0.12)
                f.write(
                    f"{rng.integers(0, NUM_CLASSES)} {cx:.6f} {cy:.6f} "
                    f"{bw:.6f} {bh:.6f}\n"
                )

    # side B: the production evaluator over the on-disk dataset
    metrics_b = evaluator.evaluate_dataset(
        paths,
        str(lbl_dir),
        NUM_CLASSES,
        yolo_conf=0.001,
        benchmark_conf=0.25,
        warmup=0,
        metrics_mode="reference",
    )

    # side A: the reference main-loop accumulation (process_image
    # e2e.py:993-999: bbox int tuples + conf + cls_class; GT int corners
    # via its parse_yolo_label e2e.py:137-157).  PNG round trip is
    # lossless, so the pre-computed side_a_eval results are the same flow.
    all_preds, all_gts = [], []
    for p, preds in zip(paths, side_a_eval):
        img = cv2.imread(p)
        h, w = img.shape[:2]
        boxes = np.array([r["bbox"] for r in preds], np.float32).reshape(-1, 4)
        scores = np.array([r["det_conf"] for r in preds], np.float32)
        labels = np.array([r["cls_class"] for r in preds], np.int32)
        all_preds.append((boxes, scores, labels))
        gt_boxes, gt_cls = [], []
        with open(lbl_dir / (os.path.splitext(os.path.basename(p))[0] + ".txt")) as f:
            for line in f:
                parts = line.split()
                cls_id = int(parts[0])
                xc, yc, bw, bh = map(float, parts[1:5])
                gt_boxes.append(
                    [
                        int((xc - bw / 2) * w),
                        int((yc - bh / 2) * h),
                        int((xc + bw / 2) * w),
                        int((yc + bh / 2) * h),
                    ]
                )
                gt_cls.append(cls_id)
        all_gts.append(
            (
                np.asarray(gt_boxes, np.float32).reshape(-1, 4),
                np.asarray(gt_cls, np.int32),
            )
        )
    raw = evaluate_predictions_reference(all_preds, all_gts, NUM_CLASSES)

    for key in ("mean_precision", "mean_recall", "mean_f1", "mAP50", "mAP50_95"):
        np.testing.assert_allclose(
            float(np.asarray(raw[key])),
            float(np.asarray(metrics_b[key])),
            atol=1e-6,
            err_msg=key,
        )
