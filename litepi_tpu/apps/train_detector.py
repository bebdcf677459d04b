"""Detector training CLI.

Re-creates the reference's detector-training capability (reference:
train_model/train-yolo-custom-tt100k.ipynb cells 28-38: Ultralytics
``YOLO(cfg).train(data, imgsz=640, epochs=30, batch=16, mosaic=0.7,
scale=0.5, hsv aug, patience=5, pretrained=False)``) as a native JAX train
loop: TAL + CIoU + DFL loss, SGD/nesterov with warmup-free cosine decay,
mosaic/HSV/flip augmentation on the host feeding a jitted step that shards
over the ('data', 'model') device mesh, per-epoch val mAP@0.5 with
early-stopping patience, best-checkpoint saving via orbax.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Train the YOLO-LitePi detector (TPU)")
    p.add_argument("--images", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--val_images", default=None)
    p.add_argument("--val_labels", default=None)
    p.add_argument(
        "--variant", default="yolo_plus_v2",
        choices=["yolo_plus_v2", "yolo_plus_v1", "yolov8n", "yolov11n",
                 "yolov5n"],
        help="yolov5n = the u-variant the reference deployed (anchor-free "
        "DFL head, trains under the same TAL loss as the v8 family)",
    )
    p.add_argument("--num_classes", type=int, default=1)
    p.add_argument(
        "--width_scale", type=float, default=None,
        help="ablation width scale on the v8 base stage widths (the "
        "revision-ablation-study grid; yolo_plus/v8 variants only — "
        "w=0.75 reproduces the shipped yolo_plus_v2 base)",
    )
    p.add_argument(
        "--depth_scale", type=float, default=None,
        help="ablation depth scale (C2f repeats; see --width_scale)",
    )
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--mosaic", type=float, default=0.7)
    p.add_argument("--scale", type=float, default=0.5)
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--output", default="runs/detector")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--data_parallel", type=int, default=1)
    # validate + checkpoint the EMA weights (the Ultralytics default); raw
    # weights with --no_ema
    p.add_argument("--no_ema", action="store_true")
    p.add_argument(
        "--resume", action="store_true",
        help="continue from {output}/resume (full state: params, EMA, "
        "optimizer moments, epoch cursor); pass the SAME --epochs as the "
        "original run — the lr schedule spans the total epoch budget",
    )
    p.add_argument(
        "--stop_after", type=int, default=None,
        help="stop after N epochs THIS invocation (the lr schedule still "
        "spans --epochs); resume later with --resume",
    )
    args = p.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from litepi_tpu.core.types import YOLO_PLUS_V1, YOLO_PLUS_V2, YOLOV8N
    from litepi_tpu.data.dataset import DetectionDataset, Prefetcher
    from litepi_tpu.evals.labels import parse_yolo_label
    from litepi_tpu.evals.map import evaluate_predictions
    from litepi_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from litepi_tpu.train.detector import (
        create_detector_train_state,
        detector_train_step,
    )
    from litepi_tpu.weights.checkpoint import (
        load_train_checkpoint,
        save_checkpoint,
        save_train_checkpoint,
    )

    base = {
        "yolo_plus_v2": YOLO_PLUS_V2,
        "yolo_plus_v1": YOLO_PLUS_V1,
        "yolov8n": YOLOV8N,
        # v11n/v5nu share v8n's stride-8/16/32 grid + reg_max for the TAL
        # loss; their actual models are injected below
        "yolov11n": YOLOV8N,
        "yolov5n": YOLOV8N,
    }[args.variant]
    cfg = dataclasses.replace(
        base, num_classes=args.num_classes, input_size=args.imgsz
    )
    if args.width_scale is not None or args.depth_scale is not None:
        if args.variant in ("yolov11n", "yolov5n"):
            print(
                "error: --width_scale/--depth_scale cover the "
                "yolo_plus/yolov8n family (the reference's ablation grid)",
                file=sys.stderr,
            )
            return 2
        from litepi_tpu.core.types import ablation_configs

        (cfg,) = ablation_configs(
            width_scales=(args.width_scale or 0.75,),
            depth_scales=(args.depth_scale or 0.33,),
            extra=(),
            num_classes=args.num_classes,
        )
        cfg = dataclasses.replace(cfg, input_size=args.imgsz)
    custom_model = None
    if args.variant == "yolov11n":
        from litepi_tpu.models.yolov11 import YoloV11

        custom_model = YoloV11(
            num_classes=args.num_classes, dtype=jnp.bfloat16
        )
    elif args.variant == "yolov5n":
        from litepi_tpu.models.yolov5 import YoloV5

        custom_model = YoloV5(
            num_classes=args.num_classes, dtype=jnp.bfloat16,
            anchor_free=True,
        )

    dataset = DetectionDataset(
        args.images,
        args.labels,
        input_size=args.imgsz,
        max_gt=args.max_gt,
        mosaic_p=args.mosaic,
        scale=args.scale,
        seed=args.seed,
    )
    global_images = len(dataset.pairs)
    if jax.process_count() > 1:
        # multi-host: each process decodes a disjoint shard; --batch is the
        # per-process size (global batch = batch * process_count)
        from litepi_tpu.data.distributed import shard_paths

        dataset.pairs = shard_paths(dataset.pairs)
        print(
            f"process {jax.process_index()}/{jax.process_count()}: "
            f"{len(dataset.pairs)} local images"
        )
    # steps/epoch MUST be computed from the GLOBAL image count: local shard
    # lengths differ by up to one image across processes, and a per-process
    # step count would desynchronise the SPMD collectives (one process
    # dispatching a step the others never join) and the LR schedule
    steps = args.steps_per_epoch or max(
        global_images // (args.batch * jax.process_count()), 1
    )
    print(f"dataset: {len(dataset)} images, {steps} steps/epoch")

    # Ultralytics one-cycle lr: 3-epoch linear warmup, cosine to lr*0.01
    model, state, tx = create_detector_train_state(
        cfg,
        seed=args.seed,
        lr=args.lr,
        dtype=jnp.bfloat16,
        total_steps=args.epochs * steps,
        warmup_steps=min(3, args.epochs) * steps,
        model=custom_model,
    )
    step_fn = jax.jit(
        functools.partial(detector_train_step, model, tx, cfg=cfg)
    )

    mesh = None
    if args.data_parallel > 1:
        mesh = make_mesh(args.data_parallel)
        state = jax.device_put(state, replicated_sharding(mesh))
        print(f"mesh: {dict(mesh.shape)}")

    def place(batch):
        if mesh is not None:
            if jax.process_count() > 1:
                # multi-host: this process's host batch is one shard of the
                # global batch (data/distributed.py); nothing crosses DCN
                from litepi_tpu.data.distributed import make_global_batch

                return make_global_batch(mesh, batch)
            return jax.device_put(batch, batch_sharding(mesh))
        return batch

    # -------------------- val helper (mAP@0.5) ------------------------ #
    def validate() -> float:
        if not (args.val_images and args.val_labels):
            return float("nan")
        from litepi_tpu.core.types import NMSConfig, PipelineConfig
        from litepi_tpu.pipeline.evaluator import PipelineEvaluator
        from litepi_tpu.pipeline.two_stage import TwoStagePipeline
        from litepi_tpu.evals.labels import sample_images
        from litepi_tpu.models import build_classifier
        from litepi_tpu.models.init_utils import fast_init

        pcfg = PipelineConfig(
            detector=cfg,
            nms=NMSConfig(max_candidates=512, max_detections=64, min_area=0.0),
            input_color="bgr",  # val images come via cv2.imread
            num_classifier_classes=max(args.num_classes, 2),
            det_input_size=args.imgsz,
            batch_size=args.batch,
        )
        weights = state.params if args.no_ema else state.ema_params
        det_vars = {"params": weights, "batch_stats": state.batch_stats}
        cls_model = build_classifier(
            pcfg.classifier_arch, pcfg.num_classifier_classes
        )
        pipe = TwoStagePipeline(
            pcfg, det_vars, fast_init(cls_model, seed=1),
            dtype=jnp.bfloat16,
            # custom baselines (v11/v5u) validate through their own model;
            # the yolo_plus family uses the pipeline's deploy-form default
            det_model=custom_model,
        )
        ev = PipelineEvaluator(pipe)
        paths = sample_images(args.val_images)
        preds, gts = [], []
        bs = args.batch
        batches = [paths[i : i + bs] for i in range(0, len(paths), bs)]
        if batches and len(batches[-1]) < bs:
            pad = bs - len(batches[-1])
            trailing = len(batches[-1])
            batches[-1] = batches[-1] + [batches[-1][-1]] * pad
        else:
            trailing = bs
        import cv2

        for i, b in enumerate(batches):
            real = trailing if i == len(batches) - 1 else bs
            results = ev.run_batch(b, conf_threshold=0.001)
            for path, res in zip(b[:real], results[:real]):
                img = cv2.imread(path)
                h, w = img.shape[:2]
                lbl = os.path.join(
                    args.val_labels,
                    os.path.splitext(os.path.basename(path))[0] + ".txt",
                )
                gb, gc = parse_yolo_label(lbl, w, h)
                # detection-level eval: both sides class 0 ("sign") — the
                # detector is single-class; leaving multi-class GT ids
                # unmapped would zero the AP of every non-0 class
                gts.append((gb, np.zeros_like(gc)))
                if res is None:
                    preds.append(
                        (np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, np.int32))
                    )
                else:
                    # detector-level eval: class 0 (the "sign" class)
                    preds.append(
                        (
                            res["boxes"],
                            res["det_scores"],
                            np.zeros(len(res["boxes"]), np.int32),
                        )
                    )
        m = evaluate_predictions(preds, gts, num_classes=1)
        return m["mAP50"]

    # -------------------- train loop ---------------------------------- #
    # -inf, not -1: the no-val score is -mean_loss, which starts far below -1
    best_map, best_epoch, start_epoch = float("-inf"), -1, 0
    os.makedirs(args.output, exist_ok=True)
    resume_dir = os.path.join(args.output, "resume")
    if args.resume and (
        os.path.isdir(resume_dir) or os.path.isdir(resume_dir + ".old")
    ):
        state, meta = load_train_checkpoint(
            resume_dir,
            state,
            meta_template={"next_epoch": 0, "best_score": 0.0,
                           "best_epoch": 0},
        )
        # orbax restores host-committed arrays; re-pin to the accelerator
        # (mixing them with device-placed batches is a jit device error)
        if mesh is not None:
            state = jax.device_put(state, replicated_sharding(mesh))
        else:
            state = jax.device_put(state, jax.local_devices()[0])
        start_epoch = int(meta["next_epoch"])
        best_map, best_epoch = float(meta["best_score"]), int(meta["best_epoch"])
        print(
            f"resumed from {resume_dir}: epoch {start_epoch}, "
            f"step {int(state.step)}, best {best_map:.4f}"
        )
    elif args.resume:
        print(f"--resume: no checkpoint at {resume_dir}, starting fresh")
    if args.resume and jax.process_count() > 1:
        # Every process loads the resume point independently; without a
        # shared filesystem a process that cannot see the file would start
        # at epoch 0 while others resume at epoch k — divergent loop
        # lengths silently desynchronise the SPMD collectives.  Verify
        # agreement and abort loudly on mismatch.
        from jax.experimental import multihost_utils

        epochs_seen = multihost_utils.process_allgather(
            np.asarray(start_epoch)
        )
        if int(epochs_seen.min()) != int(epochs_seen.max()):
            raise RuntimeError(
                "--resume: processes disagree on the resume epoch "
                f"({sorted(int(e) for e in np.ravel(epochs_seen))}); the "
                "checkpoint directory must live on a filesystem shared by "
                "every process"
            )
    epoch = start_epoch - 1  # keeps results.json sane when the loop is empty
    for epoch in range(start_epoch, args.epochs):
        t0 = time.perf_counter()
        # epoch-seeded cursor: a resumed run sees exactly the batches the
        # uninterrupted run would have (dataset RNG is (seed, epoch)-pure)
        dataset.seed_epoch(epoch)
        it = Prefetcher(dataset.batches(args.batch, steps))
        losses = []
        for batch in it:
            state, metrics = step_fn(state, place(batch))
            losses.append(metrics["loss"])
        mean_loss = float(np.mean([float(l) for l in losses]))
        val_map = validate()
        dt = time.perf_counter() - t0
        print(
            f"epoch {epoch + 1}/{args.epochs}  loss {mean_loss:.4f}  "
            f"val mAP50 {val_map:.4f}  ({dt:.1f}s)"
        )
        score = val_map if val_map == val_map else -mean_loss  # NaN -> loss
        if score > best_map:
            best_map, best_epoch = score, epoch
            save_checkpoint(
                os.path.join(args.output, "best"),
                {
                    "params": jax.device_get(
                        state.params if args.no_ema else state.ema_params
                    ),
                    "batch_stats": jax.device_get(state.batch_stats),
                },
            )
        save_train_checkpoint(
            resume_dir,
            state,
            {"next_epoch": epoch + 1, "best_score": best_map,
             "best_epoch": best_epoch},
        )
        if epoch - best_epoch >= args.patience:
            print(f"early stop: no improvement for {args.patience} epochs")
            break
        if args.stop_after and epoch + 1 - start_epoch >= args.stop_after:
            print(f"stopping after {args.stop_after} epochs (resume with "
                  f"--resume)")
            break

    save_checkpoint(
        os.path.join(args.output, "last"),
        {
            "params": jax.device_get(
                state.params if args.no_ema else state.ema_params
            ),
            "batch_stats": jax.device_get(state.batch_stats),
        },
    )
    # one-line harvestable summary (apps/ablation.py and users read this;
    # the reference's ablation notebook collected the same fields from
    # Ultralytics results_dict — revision-ablation-study.ipynb cell 12)
    import json

    with open(os.path.join(args.output, "results.json"), "w") as f:
        json.dump(
            {
                "variant": args.variant,
                "config": cfg.name,
                # null when no val set was given (validate() returns NaN
                # and the best tracker never fires)
                "best_map50": round(best_map, 6) if best_epoch >= 0 else None,
                "best_epoch": best_epoch + 1 if best_epoch >= 0 else None,
                "epochs_run": epoch + 1,
            },
            f,
        )
    print(f"best score {best_map:.4f} at epoch {best_epoch + 1}; "
          f"checkpoints in {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
