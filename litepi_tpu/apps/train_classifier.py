"""Classifier training CLI.

Re-creates the reference's classifier training capability (reference:
train_model/train-model-tsr-tt100k.ipynb cells 9-32: ImageFolder 64x64
crops, dataset mean/std, ColorJitter, MixUp(0.4)/CutMix(1.0) collate p=0.7,
Adam 1e-3 + cosine T_max=10, CE loss, grad-clip 1.0, 30 epochs, early-stop
patience 5, checkpoint on best val loss) as a native JAX loop over the
litepi_tpu classifier zoo.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Train a crop classifier (TPU)")
    p.add_argument("--data", required=True, help="ImageFolder root (train)")
    p.add_argument("--val_data", default=None, help="ImageFolder root (val)")
    p.add_argument(
        "--arch", default="shufflenetv2",
        choices=["shufflenetv2", "resnet18", "mobilenetv2", "efficientnet"],
    )
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--mix_p", type=float, default=0.7)
    p.add_argument("--mean", type=float, nargs=3, default=[0.18, 0.18, 0.18])
    p.add_argument("--std", type=float, nargs=3, default=[0.34, 0.34, 0.34])
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--output", default="runs/classifier")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument(
        "--resume", action="store_true",
        help="continue from {output}/resume (full state + epoch cursor); "
        "pass the SAME --epochs as the original run — the lr schedule "
        "spans the total epoch budget",
    )
    p.add_argument(
        "--stop_after", type=int, default=None,
        help="stop after N epochs THIS invocation; resume with --resume",
    )
    args = p.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from litepi_tpu.data.dataset import CropClassificationDataset, Prefetcher
    from litepi_tpu.models import build_classifier
    from litepi_tpu.train.classifier import (
        classifier_train_step,
        create_classifier_train_state,
    )
    from litepi_tpu.weights.checkpoint import (
        load_train_checkpoint,
        save_checkpoint,
        save_train_checkpoint,
    )

    train_ds = CropClassificationDataset(
        args.data,
        input_size=args.img_size,
        mean=args.mean,
        std=args.std,
        mix_p=args.mix_p,
        seed=args.seed,
    )
    nc = train_ds.num_classes
    steps = args.steps_per_epoch or max(len(train_ds) // args.batch, 1)
    print(f"train: {len(train_ds)} crops | {nc} classes | {steps} steps/epoch")

    val_ds = None
    if args.val_data:
        val_ds = CropClassificationDataset(
            args.val_data,
            input_size=args.img_size,
            mean=args.mean,
            std=args.std,
            augment=False,
        )

    model = build_classifier(args.arch, nc, dtype=jnp.bfloat16)
    state, tx = create_classifier_train_state(
        model,
        input_size=args.img_size,
        seed=args.seed,
        lr=args.lr,
        total_steps=steps * args.epochs,
    )
    step_fn = jax.jit(functools.partial(classifier_train_step, model, tx))
    eval_fn = jax.jit(
        lambda params, stats, x: model.apply(
            {"params": params, "batch_stats": stats}, x, train=False
        )
    )

    def validate():
        if val_ds is None:
            return float("nan"), float("nan")
        losses, correct, total = [], 0, 0
        import optax

        for batch in val_ds.batches(args.batch, steps=None, shuffle=False):
            logits = eval_fn(state.params, state.batch_stats, batch["images"])
            losses.append(
                float(
                    optax.softmax_cross_entropy_with_integer_labels(
                        np.asarray(logits, np.float32), batch["hard_labels"]
                    ).mean()
                )
            )
            correct += int(
                (np.asarray(logits).argmax(-1) == batch["hard_labels"]).sum()
            )
            total += len(batch["hard_labels"])
            break_after = len(val_ds) // args.batch
            if len(losses) >= max(break_after, 1):
                break
        return float(np.mean(losses)), correct / max(total, 1)

    best_val, best_epoch, start_epoch = float("inf"), -1, 0
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
        state = jax.device_put(state, jax.local_devices()[0])
        start_epoch = int(meta["next_epoch"])
        best_val, best_epoch = float(meta["best_score"]), int(meta["best_epoch"])
        print(f"resumed from {resume_dir}: epoch {start_epoch}, "
              f"best {best_val:.4f}")
    elif args.resume:
        print(f"--resume: no checkpoint at {resume_dir}, starting fresh")
    for epoch in range(start_epoch, args.epochs):
        t0 = time.perf_counter()
        # (seed, epoch)-pure RNGs so a resumed run replays the exact stream
        train_ds.seed_epoch(epoch)
        key = jax.random.fold_in(jax.random.key(args.seed), epoch)
        losses, accs = [], []
        for batch in Prefetcher(train_ds.batches(args.batch, steps)):
            key, sub = jax.random.split(key)
            state, m = step_fn(state, batch, sub)
            losses.append(m["loss"])
            accs.append(m["accuracy"])
        val_loss, val_acc = validate()
        dt = time.perf_counter() - t0
        print(
            f"epoch {epoch + 1}/{args.epochs}  "
            f"loss {float(np.mean([float(l) for l in losses])):.4f}  "
            f"acc {float(np.mean([float(a) for a in accs])):.4f}  "
            f"val_loss {val_loss:.4f}  val_acc {val_acc:.4f}  ({dt:.1f}s)"
        )
        score = val_loss if val_loss == val_loss else float(
            np.mean([float(l) for l in losses])
        )
        if score < best_val:
            best_val, best_epoch = score, epoch
            save_checkpoint(
                os.path.join(args.output, "best"),
                {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                },
            )
        save_train_checkpoint(
            resume_dir,
            state,
            {"next_epoch": epoch + 1, "best_score": best_val,
             "best_epoch": best_epoch},
        )
        if epoch - best_epoch >= args.patience:
            print(f"early stop: no improvement for {args.patience} epochs")
            break
        if args.stop_after and epoch + 1 - start_epoch >= args.stop_after:
            print(f"stopping after {args.stop_after} epochs (resume with "
                  f"--resume)")
            break

    print(f"best val loss {best_val:.4f} at epoch {best_epoch + 1}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
