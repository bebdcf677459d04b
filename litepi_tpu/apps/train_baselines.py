"""Baseline detector training CLI: Faster R-CNN and SSD300.

Re-creates the reference's baseline-training capability
(train-other-model-tsd-tt100k.ipynb cell 11: FasterRCNN-ResNet50-FPN with a
swapped 2-class head, SGD lr 1e-4 momentum 0.9 weight-decay 5e-4,
StepLR(step=3, gamma=0.1), batch 8, 30 epochs; cell 13: SSD300-VGG16,
AdamW lr 1e-4 weight-decay 1e-4, CosineAnnealingLR T_max=30) as native JAX
train loops: the ground-up Flax models (models/faster_rcnn.py, models/ssd.py)
under their fixed-shape losses (train/frcnn_loss.py, train/ssd_loss.py),
fed by the shared DetectionDataset, jitted and shardable over the data
mesh, with orbax best/last checkpoints that load straight into
``bench/detector_bench.py --checkpoint`` (the reference's
eval-other-model-tsd-*.ipynb flow).

The reference starts from ImageNet-pretrained backbones; no torchvision
weights exist in this environment, so training starts from random init —
the optimisation recipe, loss formulation and artifact contract are what
this CLI reproduces.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Train the Faster-RCNN / SSD300 baseline detectors (TPU)"
    )
    p.add_argument("--arch", required=True, choices=["faster_rcnn", "ssd300"])
    p.add_argument("--images", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--val_images", default=None)
    p.add_argument("--val_labels", default=None)
    p.add_argument("--num_classes", type=int, default=1,
                   help="foreground classes (background is internal — the "
                   "reference's NUM_CLASSES=2 includes it)")
    p.add_argument("--imgsz", type=int, default=None,
                   help="default: 640 (faster_rcnn) / 300 (ssd300, fixed "
                   "by the default-box grid)")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--max_gt", type=int, default=64)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--output", default="runs/baseline")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--data_parallel", type=int, default=1)
    # tiny-run knobs (test/dev): shrink the FRCNN proposal budgets
    p.add_argument("--pre_nms_topk", type=int, default=1024)
    p.add_argument("--post_nms_topk", type=int, default=256)
    args = p.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import functools

    import jax.numpy as jnp
    import numpy as np
    import optax

    from litepi_tpu.data.dataset import DetectionDataset, Prefetcher
    from litepi_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from litepi_tpu.weights.checkpoint import save_checkpoint

    if args.arch == "ssd300" and args.imgsz not in (None, 300):
        print("error: ssd300 input is fixed at 300 (default-box grid)",
              file=sys.stderr)
        return 2
    imgsz = args.imgsz or (300 if args.arch == "ssd300" else 640)

    dataset = DetectionDataset(
        args.images, args.labels, input_size=imgsz, max_gt=args.max_gt,
        seed=args.seed,
    )
    steps = args.steps_per_epoch or max(len(dataset) // args.batch, 1)
    total_steps = args.epochs * steps
    print(f"dataset: {len(dataset)} images, {steps} steps/epoch")

    # ---------------- model + loss + optimizer per arch ---------------- #
    if args.arch == "faster_rcnn":
        from litepi_tpu.models.faster_rcnn import FasterRCNN
        from litepi_tpu.train.frcnn_loss import frcnn_loss

        model = FasterRCNN(
            num_classes=args.num_classes, input_size=imgsz,
            pre_nms_topk=args.pre_nms_topk, post_nms_topk=args.post_nms_topk,
            dtype=jnp.bfloat16,
        )
        # StepLR(step_size=3 epochs, gamma=0.1) over SGD momentum+wd
        # (cell 11's torch recipe; wd enters before momentum like torch SGD)
        boundaries = {
            3 * k * steps: 0.1 for k in range(1, max(args.epochs // 3 + 1, 2))
        }
        schedule = optax.piecewise_constant_schedule(args.lr, boundaries)
        tx = optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.sgd(schedule, momentum=0.9),
        )

        def loss_fn(params, stats, batch, key):
            out, mut = model.apply(
                {"params": params, "batch_stats": stats},
                batch["images"], train=True, mutable=["batch_stats"],
            )
            loss, aux = frcnn_loss(
                out, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_mask"], key,
            )
            return loss, (mut["batch_stats"], aux)

    else:
        from litepi_tpu.models.ssd import SSD300, ssd_default_boxes
        from litepi_tpu.ops.boxes import xywh_to_xyxy
        from litepi_tpu.train.ssd_loss import multibox_loss

        model = SSD300(num_classes=args.num_classes, dtype=jnp.bfloat16)
        db_cxcywh = jnp.asarray(ssd_default_boxes(imgsz))
        db_xyxy = xywh_to_xyxy(db_cxcywh)
        # AdamW + cosine anneal to 0 over the epoch budget (cell 13)
        schedule = optax.cosine_decay_schedule(args.lr, total_steps)
        tx = optax.adamw(schedule, weight_decay=1e-4)

        def loss_fn(params, stats, batch, key):
            del key
            out = model.apply({"params": params}, batch["images"], train=True)
            loss, aux = multibox_loss(
                out, db_xyxy, db_cxcywh, batch["gt_boxes"],
                batch["gt_labels"], batch["gt_mask"],
            )
            return loss, (stats, aux)

    # ---------------- init + train step -------------------------------- #
    from litepi_tpu.models.init_utils import fast_init

    if args.arch == "faster_rcnn":
        # params are spatial-size independent (fully conv to the 7x7
        # RoIAlign): init a tiny twin to skip the full-res trace
        tiny = FasterRCNN(
            num_classes=args.num_classes, input_size=64,
            pre_nms_topk=64, post_nms_topk=16, dtype=jnp.bfloat16,
        )
        variables = fast_init(tiny, seed=args.seed, spatial=64)
    else:
        variables = fast_init(model, seed=args.seed, spatial=imgsz)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, stats, opt_state, batch, key):
        (loss, (new_stats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stats, batch, key)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    mesh = None
    if args.data_parallel > 1:
        mesh = make_mesh(args.data_parallel)
        rep = replicated_sharding(mesh)
        params, stats, opt_state = (
            jax.device_put(params, rep),
            jax.device_put(stats, rep),
            jax.device_put(opt_state, rep),
        )
        print(f"mesh: {dict(mesh.shape)}")

    def place(batch):
        if mesh is not None:
            return jax.device_put(batch, batch_sharding(mesh))
        return batch

    def current_vars():
        v = {"params": jax.device_get(params)}
        if stats:
            v["batch_stats"] = jax.device_get(stats)
        return v

    def validate() -> float:
        if not (args.val_images and args.val_labels):
            return float("nan")
        from litepi_tpu.bench.detector_bench import evaluate_detector

        row = evaluate_detector(
            args.arch, args.val_images, args.val_labels,
            det_vars=current_vars(), num_classes=args.num_classes,
            input_size=imgsz, conf=0.001,
        )
        return float(row["mAP50"])

    # ---------------- train loop --------------------------------------- #
    key = jax.random.key(args.seed)
    best_score, best_epoch = float("-inf"), -1
    os.makedirs(args.output, exist_ok=True)
    epoch = -1
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        dataset.seed_epoch(epoch)
        losses = []
        for batch in Prefetcher(dataset.batches(args.batch, steps)):
            key, sub = jax.random.split(key)
            params, stats, opt_state, loss = step_fn(
                params, stats, opt_state, place(batch), sub
            )
            losses.append(loss)
        mean_loss = float(np.mean([float(l) for l in losses]))
        val_map = validate()
        dt = time.perf_counter() - t0
        print(
            f"epoch {epoch + 1}/{args.epochs}  loss {mean_loss:.4f}  "
            f"val mAP50 {val_map:.4f}  ({dt:.1f}s)"
        )
        score = val_map if val_map == val_map else -mean_loss  # NaN -> loss
        if score > best_score:
            best_score, best_epoch = score, epoch
            save_checkpoint(os.path.join(args.output, "best"), current_vars())
        if epoch - best_epoch >= args.patience:
            print(f"early stop: no improvement for {args.patience} epochs")
            break

    save_checkpoint(os.path.join(args.output, "last"), current_vars())
    import json

    with open(os.path.join(args.output, "results.json"), "w") as f:
        json.dump(
            {
                "arch": args.arch,
                "best_score": round(best_score, 6) if best_epoch >= 0 else None,
                "best_epoch": best_epoch + 1 if best_epoch >= 0 else None,
                "epochs_run": epoch + 1,
            },
            f,
        )
    print(f"best score {best_score:.4f} at epoch {best_epoch + 1}; "
          f"checkpoints in {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
