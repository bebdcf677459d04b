"""End-to-end evaluation CLI, flag-compatible with the reference ``e2e.py``
(reference: src/tt100k/pipeline/e2e.py:1013-1189).

Detector weights load from any of the reference's deployed artifact
formats, converted on the fly (all collapse onto the one XLA backend):

* ``--detector_param model.ncnn.param --detector_bin model.ncnn.bin`` —
  the reference CLI's native flags (e2e.py:195-220 ``NCNNDetector``);
  the architecture (yolo_plus v1/v2, yolov8n, yolov5nu, yolov11n) is
  inferred from the graph topology;
* ``--detector foo.xml`` — OpenVINO IR (+ sibling ``.bin`` or
  ``--detector_bin``), the runner.py backend's format; same
  topology-probe family coverage as ``.param``;
* ``--detector foo.onnx`` — the ONNX export;
* ``--detector best.pt`` — an Ultralytics training container;
* ``--detector ckpt_dir`` — an orbax checkpoint (apps/convert.py output).

Classifier weights load from an orbax checkpoint or a torch ``.pth``.

Usage:
    python -m litepi_tpu.apps.e2e \
        --detector ckpt/yolo_plus_v2 --classifier weights/shufflenetv2.pth \
        --clf_arch shufflenetv2 --input data/images --labels data/labels \
        --classes idx2label.json --output output_eval
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Two-stage TSR e2e evaluation (TPU)")
    # weights
    p.add_argument(
        "--detector", default=None,
        help="orbax checkpoint dir, .onnx/.pt export, OpenVINO .xml, "
        "or 'random'",
    )
    p.add_argument(
        "--detector_param", default=None,
        help="NCNN .param graph (with --detector_bin)",
    )
    p.add_argument(
        "--detector_bin", default=None,
        help="NCNN .bin weights; also the OpenVINO .bin when --detector "
        "is an .xml whose sibling .bin is elsewhere",
    )
    p.add_argument(
        "--detector_variant",
        default=None,  # resolved from --dataset preset when omitted
        choices=["yolo_plus_v2", "yolo_plus_v1", "yolov8n", "yolov11n",
                 "yolov5n", "yolov5n_legacy"],
    )
    # dataset preset: class count, shipped detector, classifier crop stats
    # (tt100k: 91 cls / v2 / 0.18/0.34; vntsr: 49 cls / v1 / per-channel
    # stats from dataset_stats.npz)
    p.add_argument("--dataset", default="tt100k", choices=["tt100k", "vntsr"])
    p.add_argument(
        "--cls_mean", type=float, nargs="+", default=None,
        help="classifier crop normalisation mean (1 or 3 floats)",
    )
    p.add_argument(
        "--cls_std", type=float, nargs="+", default=None,
        help="classifier crop normalisation std (1 or 3 floats)",
    )
    p.add_argument(
        "--classifier", default=None,
        help="orbax dir, torch .pth, NCNN .param (+ sibling .bin), "
        "classifier .onnx, or OpenVINO .xml (+ sibling .bin) — every "
        "form the reference deploys its second stage in",
    )
    p.add_argument(
        "--clf_arch",
        default="shufflenetv2",
        choices=["resnet18", "efficientnet", "mobilenetv2", "shufflenetv2"],
    )
    p.add_argument("--num_classes", type=int, default=None)
    # data
    p.add_argument("--input", required=True, help="image directory")
    p.add_argument("--labels", required=True, help="YOLO label directory")
    p.add_argument("--classes", default=None, help="idx2label.json or names txt")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    # thresholds (reference defaults, e2e.py:1014-1050)
    p.add_argument("--yolo_conf", type=float, default=0.001)
    p.add_argument("--benchmark_conf", type=float, default=0.25)
    p.add_argument("--min_area", type=float, default=50.0)
    p.add_argument("--iou_threshold", type=float, default=0.45)
    p.add_argument("--det_input_size", type=int, default=640)
    p.add_argument("--cls_input_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_det", type=int, default=64)
    p.add_argument("--max_candidates", type=int, default=512)
    # mAP-pass budgets; 0 = unbounded, the reference's low-conf protocol
    # (candidates = all anchors, survivors uncapped; host NMS)
    p.add_argument("--eval_max_det", type=int, default=0)
    p.add_argument("--eval_max_candidates", type=int, default=0)
    p.add_argument(
        "--detector_threads", type=int, default=4, help=argparse.SUPPRESS
    )  # accepted for compatibility; XLA owns on-chip threading
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument(
        "--roi_impl", default="dense",
        choices=["dense", "windowed", "pallas"],
        help="fused-path ROI crop implementation (ops/roi.py measurements)",
    )
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    # TPU MXUs multiply float32 operands as bfloat16 by default; 'highest'
    # uses true f32 multiplies (3-pass), measured 7e-4 px vs 3.3 px
    # divergence from the reference graph at 640 — use for parity evals
    p.add_argument(
        "--matmul_precision", default=None,
        choices=["default", "high", "highest"],
    )
    # metric semantics: "reference" reproduces the reference evaluator
    # exactly (e2e.py:656-824) so CSV rows are comparable to its published
    # numbers; "ultralytics" is the stricter Ultralytics-contract evaluator
    p.add_argument(
        "--metrics", default="reference",
        choices=["reference", "ultralytics", "level0"],
        help="level0 = the simple single-IoU greedy surface of the "
        "level-0 baseline (e2e_level0.py:201-261; no mAP columns)",
    )
    # output
    p.add_argument("--output", default="output_eval")
    p.add_argument("--save_viz", action="store_true")
    # e2e_optimize.py's extra knobs (e2e_optimize.py:882-889); --no_jit is
    # meaningless under XLA (everything is jit) but accepted for script
    # compatibility
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--no_jit", action="store_true", help=argparse.SUPPRESS)
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    # deployed-artifact ingestion: infer the yolo_plus variant from the
    # graph itself so --detector_variant can stay unset (the reference CLI
    # carries no variant flag — the .param IS the architecture)
    explicit_variant = args.detector_variant
    inferred_variant = None
    if args.detector_param:
        if not args.detector_bin:
            print(
                "error: --detector_param needs --detector_bin (note: the "
                "tt100k tree's model.ncnn.bin is stripped upstream — see "
                ".MISSING_LARGE_BLOBS; the vntsr v1 pair survives)",
                file=sys.stderr,
            )
            return 2
        from litepi_tpu.weights.ncnn_import import (
            infer_detector_config,
            parse_ncnn_param,
            verify_ncnn_variant_topology,
        )

        inferred_cfg = None
        try:
            param_layers = parse_ncnn_param(args.detector_param)
        except (OSError, ValueError) as e:
            print(f"error: --detector_param: {e}", file=sys.stderr)
            return 2
        # the graph's decode-reshape constants are fixed at EMISSION
        # resolution, which is independent of the eval resolution (conv
        # weights are resolution-free): try the CLI's size first (artifacts
        # emitted via apps/convert.py --emit_input_size), then the
        # reference's canonical 640 (all shipped exports)
        probe_sizes = list(dict.fromkeys([args.det_input_size, 640]))
        err_plus = None
        inferred_cfg = None
        for sz in probe_sizes:
            try:
                inferred_cfg = infer_detector_config(param_layers, sz)
                inferred_variant = inferred_cfg.name
                break
            except ValueError as e:
                err_plus = e
        if inferred_cfg is None:
            # not the yolo_plus family — the reference also deploys
            # yolov5nu/yolov11n NCNN graphs (src/*/convert/model/yolo{5,11});
            # all its exports are single-class, which the probe assumes
            for ncnn_variant, cli_name in (
                ("yolov5nu", "yolov5n"), ("yolov11n", "yolov11n")
            ):
                ok = False
                for sz in probe_sizes:
                    try:
                        verify_ncnn_variant_topology(
                            param_layers, ncnn_variant, input_size=sz
                        )
                        ok = True
                        break
                    except ValueError:
                        continue
                if ok:
                    inferred_variant = cli_name
                    break
            if inferred_variant is None:
                print(
                    f"error: --detector_param: {err_plus}", file=sys.stderr
                )
                return 2
    elif args.detector and args.detector.endswith(".xml"):
        from litepi_tpu.core.types import YOLO_PLUS_V1, YOLO_PLUS_V2, YOLOV8N
        from litepi_tpu.weights.openvino_import import (
            parse_openvino_xml,
            verify_openvino_topology,
            verify_openvino_variant_topology,
        )

        inferred_cfg = None
        try:
            ir_graph = parse_openvino_xml(args.detector)
        # SyntaxError covers xml.etree's ParseError on malformed IRs
        except (OSError, SyntaxError, ValueError) as e:
            print(f"error: --detector: {e}", file=sys.stderr)
            return 2
        for cand in (YOLO_PLUS_V2, YOLO_PLUS_V1, YOLOV8N):
            try:
                verify_openvino_topology(args.detector, cand, graph=ir_graph)
                inferred_cfg = cand
                inferred_variant = cand.name
                break
            except ValueError:
                continue
        if inferred_variant is None:
            # the reference also deploys yolov5nu/yolov11n OpenVINO IRs
            # (src/*/convert/model/yolo{5,11}/*_openvino_model)
            for ir_variant, cli_name in (
                ("yolov5nu", "yolov5n"), ("yolov11n", "yolov11n")
            ):
                try:
                    verify_openvino_variant_topology(
                        args.detector, ir_variant, graph=ir_graph
                    )
                    inferred_variant = cli_name
                    break
                except ValueError:
                    continue
        if inferred_variant is None:
            print(
                f"error: {args.detector} matches no deployed detector "
                "topology (yolo_plus v1/v2, yolov8n, yolov5nu, yolov11n)",
                file=sys.stderr,
            )
            return 2
    if inferred_variant is not None:
        if explicit_variant and explicit_variant != inferred_variant:
            print(
                f"error: --detector_variant {explicit_variant} conflicts "
                f"with the artifact's topology ({inferred_variant})",
                file=sys.stderr,
            )
            return 2
        args.detector_variant = inferred_variant

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision and args.matmul_precision != "default":
        jax.config.update(
            "jax_default_matmul_precision", args.matmul_precision
        )

    import jax.numpy as jnp
    import numpy as np

    from litepi_tpu.core.types import (
        DATASET_PRESETS,
        DetectorConfig,
        NMSConfig,
        PipelineConfig,
        YOLO_PLUS_V1,
        YOLO_PLUS_V2,
        YOLOV8N,
    )

    # resolve dataset preset; explicit flags always win
    preset = DATASET_PRESETS[args.dataset]
    if args.num_classes is None:
        args.num_classes = preset["num_classes"]
    if args.detector_variant is None:
        args.detector_variant = preset["detector_variant"]

    def _stats(vals, key):
        if vals is None:
            return preset[key]
        if len(vals) == 1:
            return (vals[0],) * 3
        if len(vals) == 3:
            return tuple(vals)
        print(f"error: --{key} takes 1 or 3 floats", file=sys.stderr)
        raise SystemExit(2)

    cls_mean = _stats(args.cls_mean, "cls_mean")
    cls_std = _stats(args.cls_std, "cls_std")
    from litepi_tpu.evals.labels import load_class_names, sample_images
    from litepi_tpu.models import YoloLitePi, build_classifier
    from litepi_tpu.pipeline.evaluator import PipelineEvaluator, write_results
    from litepi_tpu.pipeline.two_stage import TwoStagePipeline
    from litepi_tpu.weights.checkpoint import load_checkpoint
    from litepi_tpu.weights.torch_import import (
        convert_classifier_state_dict,
        load_torch_state_dict,
    )

    det_cfg = {
        "yolo_plus_v2": YOLO_PLUS_V2,
        "yolo_plus_v1": YOLO_PLUS_V1,
        "yolov8n": YOLOV8N,
        # v11n/v5n share v8n's stride-8/16/32 grid for NMS budget sizing;
        # their actual models + decoders are built below
        "yolov11n": YOLOV8N,
        "yolov5n": YOLOV8N,
        "yolov5n_legacy": YOLOV8N,
    }[args.detector_variant]
    det_cfg = DetectorConfig(
        **{
            **{f.name: getattr(det_cfg, f.name) for f in det_cfg.__dataclass_fields__.values()},
            "input_size": args.det_input_size,
        }
    )
    cfg = PipelineConfig(
        detector=det_cfg,
        nms=NMSConfig(
            iou_threshold=args.iou_threshold,
            max_candidates=args.max_candidates,
            max_detections=args.max_det,
            min_area=args.min_area,
            eval_max_candidates=args.eval_max_candidates,
            eval_max_detections=args.eval_max_det,
        ),
        classifier_arch=args.clf_arch,
        num_classifier_classes=args.num_classes,
        det_input_size=args.det_input_size,
        cls_input_size=args.cls_input_size,
        # frames arrive as cv2-BGR; compute is RGB (reference e2e.py:224)
        input_color="bgr",
        batch_size=args.batch_size,
        yolo_conf=args.yolo_conf,
        benchmark_conf=args.benchmark_conf,
        cls_mean=cls_mean,
        cls_std=cls_std,
        roi_impl=args.roi_impl,
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    # ---- weights ----------------------------------------------------- #
    from litepi_tpu.models.init_utils import fast_init

    candidate_decoder = None
    candidate_capacity = None
    if args.detector_variant == "yolov11n":
        from litepi_tpu.models.yolov11 import YoloV11

        det_model = YoloV11(num_classes=cfg.detector.num_classes, dtype=dtype)
    elif args.detector_variant == "yolov5n":
        # the reference's deployed yolo5 is the u-variant (anchor-free DFL
        # head, export-verified) — shared decode, no candidate decoder
        from litepi_tpu.models.yolov5 import YoloV5

        det_model = YoloV5(
            num_classes=cfg.detector.num_classes, dtype=dtype,
            anchor_free=True,
        )
    elif args.detector_variant == "yolov5n_legacy":
        from litepi_tpu.models.yolov5 import (
            YoloV5,
            v5_anchor_table,
            v5_candidates,
        )

        det_model = YoloV5(num_classes=cfg.detector.num_classes, dtype=dtype)
        g, s, a = (
            jnp.asarray(t) for t in v5_anchor_table(args.det_input_size)
        )

        def candidate_decoder(out, k, _g=g, _s=s, _a=a):
            return v5_candidates(out["pred"], _g, _s, _a, k)

        # anchor-based v5 emits 3 priors per cell: 3x the anchor-free grid
        candidate_capacity = int(g.shape[0])
    else:
        # default arch: leave det_model=None so TwoStagePipeline builds the
        # deploy form (BN folded into biased convs) — the documented serving
        # default, matching the reference's fused exports
        det_model = None
    det = args.detector or ""
    if det.endswith((".onnx", ".pt", ".pth")) and args.detector_variant in (
        "yolov5n", "yolov5n_legacy", "yolov11n"
    ):
        print(
            "error: direct v5n/v11n artifact loading covers NCNN .param "
            "pairs and OpenVINO .xml IRs; convert other formats to an "
            "orbax checkpoint with apps/convert.py first",
            file=sys.stderr,
        )
        return 2
    if args.detector_param and args.detector_variant in (
        "yolov5n", "yolov11n"
    ):
        from litepi_tpu.weights.ncnn_import import (
            convert_detector_ncnn_variant,
        )

        try:
            # param_layers from the early topology probe skips the re-parse
            det_vars = convert_detector_ncnn_variant(
                param_layers, args.detector_bin,
                "yolov5nu" if args.detector_variant == "yolov5n"
                else "yolov11n",
                cfg.detector.num_classes,
            )
        except (OSError, ValueError) as e:
            print(f"error: --detector_bin: {e}", file=sys.stderr)
            return 2
    elif args.detector_param:
        from litepi_tpu.weights.ncnn_import import convert_detector_ncnn

        try:
            # param_layers/inferred_cfg from the probe skip re-parse/-inference
            det_vars, _ = convert_detector_ncnn(
                param_layers, args.detector_bin, inferred_cfg
            )
        except (OSError, ValueError) as e:
            print(f"error: --detector_bin: {e}", file=sys.stderr)
            return 2
    elif det.endswith(".xml"):
        ov_bin = args.detector_bin or det[: -len(".xml")] + ".bin"
        try:
            if args.detector_variant in ("yolov5n", "yolov11n"):
                from litepi_tpu.weights.openvino_import import (
                    convert_detector_openvino_variant,
                )

                det_vars = convert_detector_openvino_variant(
                    det, ov_bin,
                    "yolov5nu" if args.detector_variant == "yolov5n"
                    else "yolov11n",
                    cfg.detector.num_classes,
                    graph=ir_graph,
                )
            else:
                from litepi_tpu.weights.openvino_import import (
                    convert_detector_openvino,
                )

                det_vars, _ = convert_detector_openvino(
                    det, ov_bin, inferred_cfg, graph=ir_graph
                )
        except (OSError, ValueError) as e:
            print(f"error: --detector: {e}", file=sys.stderr)
            return 2
    elif det.endswith(".onnx"):
        from litepi_tpu.weights.onnx_import import convert_detector_onnx

        try:
            det_vars = convert_detector_onnx(det, cfg.detector.depths)
        except (OSError, ValueError, KeyError) as e:
            print(f"error: --detector: {e}", file=sys.stderr)
            return 2
    elif det.endswith((".pt", ".pth")):
        from litepi_tpu.weights.onnx_import import defuse_state_dict
        from litepi_tpu.weights.torch_import import (
            convert_detector_state_dict,
        )

        try:
            det_vars = convert_detector_state_dict(
                defuse_state_dict(load_torch_state_dict(det)),
                cfg.detector.depths,
            )
        except (OSError, ValueError, KeyError, pickle.UnpicklingError) as e:
            print(f"error: --detector: {e}", file=sys.stderr)
            return 2
    elif det and det != "random":
        det_vars = load_checkpoint(det)
    else:
        print("[warn] no --detector checkpoint: using random weights", file=sys.stderr)
        det_vars = fast_init(
            det_model if det_model is not None
            else YoloLitePi(cfg.detector, dtype=dtype),
            seed=0,
        )

    cls_model = build_classifier(args.clf_arch, args.num_classes, dtype=dtype)
    if args.classifier and args.classifier.endswith((".pth", ".pt")):
        sd = load_torch_state_dict(args.classifier)
        cls_vars = convert_classifier_state_dict(args.clf_arch, sd)
    elif args.classifier and args.classifier.endswith(".param"):
        # an NCNN classifier pair (apps/convert.py --emit ncnn output, or
        # a pnnx export matching the canonical emission) — deploy form;
        # the pipeline recognises the already-folded variables
        from litepi_tpu.weights.ncnn_import import convert_classifier_ncnn

        if args.clf_arch != "shufflenetv2":
            print(
                "error: --classifier .param covers shufflenetv2 (the "
                "deployed classifier); convert other archs from .pth",
                file=sys.stderr,
            )
            return 2
        try:
            cls_vars, ncls = convert_classifier_ncnn(
                args.classifier,
                args.classifier[: -len(".param")] + ".bin",
            )
        except (OSError, ValueError) as e:
            print(f"error: --classifier: {e}", file=sys.stderr)
            return 2
        if ncls != args.num_classes:
            print(
                f"error: --classifier graph has {ncls} classes, "
                f"--num_classes says {args.num_classes}",
                file=sys.stderr,
            )
            return 2
    elif args.classifier and args.classifier.endswith(".onnx"):
        # the reference's interchange form (convert-model-classify.ipynb
        # cell 3 exports torch->ONNX first); a fused emission re-ingests
        # as deploy-form, a name-preserving torch export maps by name
        from litepi_tpu.weights.onnx_import import (
            convert_classifier_onnx,
            convert_classifier_onnx_fused,
        )

        try:
            if args.clf_arch == "shufflenetv2":
                try:
                    cls_vars, ncls = convert_classifier_onnx_fused(
                        args.classifier
                    )
                except ValueError:
                    cls_vars, ncls = (
                        convert_classifier_onnx(
                            args.clf_arch, args.classifier
                        ),
                        None,
                    )
            else:
                cls_vars, ncls = (
                    convert_classifier_onnx(args.clf_arch, args.classifier),
                    None,
                )
        except (OSError, ValueError, KeyError) as e:
            print(f"error: --classifier: {e}", file=sys.stderr)
            return 2
        if ncls is not None and ncls != args.num_classes:
            print(
                f"error: --classifier graph has {ncls} classes, "
                f"--num_classes says {args.num_classes}",
                file=sys.stderr,
            )
            return 2
    elif args.classifier and args.classifier.endswith(".xml"):
        # OpenVINO classifier IR — the reference's vntsr optimizer loads
        # this form (runner.py:229 BaselineClassifier via compile_model)
        from litepi_tpu.weights.openvino_import import (
            convert_classifier_openvino_fused,
        )

        if args.clf_arch != "shufflenetv2":
            print(
                "error: --classifier .xml covers shufflenetv2 (the "
                "deployed classifier); convert other archs from .pth",
                file=sys.stderr,
            )
            return 2
        try:
            cls_vars, ncls = convert_classifier_openvino_fused(
                args.classifier, args.classifier[: -len(".xml")] + ".bin"
            )
        except (OSError, ValueError) as e:
            print(f"error: --classifier: {e}", file=sys.stderr)
            return 2
        if ncls != args.num_classes:
            print(
                f"error: --classifier graph has {ncls} classes, "
                f"--num_classes says {args.num_classes}",
                file=sys.stderr,
            )
            return 2
    elif args.classifier:
        cls_vars = load_checkpoint(args.classifier)
    else:
        print("[warn] no --classifier weights: using random weights", file=sys.stderr)
        cls_vars = fast_init(cls_model, seed=1, spatial=cfg.cls_input_size)

    pipe = TwoStagePipeline(
        cfg,
        det_vars,
        cls_vars,
        dtype=dtype,
        det_model=det_model,
        candidate_decoder=candidate_decoder,
        candidate_capacity=candidate_capacity,
    )
    class_names = load_class_names(args.classes)

    # ---- data + eval -------------------------------------------------- #
    image_paths = sample_images(args.input, args.num_samples, args.seed)
    if not image_paths:
        print(f"error: no images found in {args.input}", file=sys.stderr)
        return 2
    print(f"Evaluating {len(image_paths)} images from {args.input}")

    evaluator = PipelineEvaluator(pipe, class_names)
    combo_dir = f"{args.detector_variant}+{args.clf_arch}"
    metrics = evaluator.evaluate_dataset(
        image_paths,
        args.labels,
        num_classes=args.num_classes,
        yolo_conf=args.yolo_conf,
        benchmark_conf=args.benchmark_conf,
        warmup=args.warmup,
        viz_dir=os.path.join(args.output, combo_dir, "viz")
        if args.save_viz
        else None,
        metrics_mode=args.metrics,
    )

    det_name = args.detector_variant
    clf_name = args.clf_arch
    combo = f"{det_name}+{clf_name}"
    write_results(
        args.output, combo, det_name, clf_name, metrics, image_paths, class_names
    )

    print(
        f"\n=== {combo} ===\n"
        f"images: {metrics['num_images']}  fps: {metrics['fps']:.2f}\n"
        f"precision: {metrics['precision']:.4f}  recall: {metrics['recall']:.4f}"
        f"  f1: {metrics['f1']:.4f}\n"
        f"mAP@0.5: {metrics['mAP50']:.4f}  mAP@0.5:0.95: {metrics['mAP50_95']:.4f}\n"
        f"stage ms/batch: {metrics['stage_ms_per_batch']}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
