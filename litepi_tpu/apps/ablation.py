"""Width/depth ablation runner — the reference's ablation study as a CLI.

The reference's `train_model/revision-ablation-study.ipynb` sweeps the
detector's width/depth grid (w in {0.5, 0.75, 1.0} x d 0.33, plus
(0.75, 0.67); cell 6 generator, cell 12 runner) and tabulates params / FPS /
mAP@0.5 per variant.  Notably its generator's ``width_multiple`` was
*ignored* by Ultralytics, so the published ablation trained ~8x larger
models than intended (SURVEY §6 footnote); the configs here actually apply
the scales.

Two modes:

* **static** (default): per variant — parameter count, forward GFLOPs at
  ``--imgsz`` (XLA cost analysis), and optionally a device-FPS measurement
  (``--bench``, in-program ``lax.scan`` timing like bench.py).
* **--train**: additionally runs ``apps/train_detector.py`` per variant on
  the given dataset and harvests its ``results.json`` (best mAP@0.5 /
  epoch), completing the notebook's accuracy column.

Writes one CSV row per variant (cell 12's table shape):
``name,width_scale,depth_scale,params,gflops,fps,map50,best_epoch``.
"""

from __future__ import annotations

import argparse
import csv
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="width/depth ablation sweep")
    p.add_argument(
        "--widths", default="0.5,0.75,1.0",
        help="comma list of width scales (reference grid: 0.5,0.75,1.0)",
    )
    p.add_argument(
        "--depths", default="0.33",
        help="comma list of depth scales (reference grid: 0.33)",
    )
    p.add_argument(
        "--extra", default="0.75:0.67",
        help="extra (w:d) combos, comma-separated ('' = none; reference "
        "adds 0.75:0.67)",
    )
    p.add_argument("--num_classes", type=int, default=1)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument(
        "--bench", action="store_true",
        help="measure device FPS per variant (batch --bench_batch, "
        "in-program scan)",
    )
    p.add_argument("--bench_batch", type=int, default=32)
    p.add_argument("--bench_iters", type=int, default=10)
    p.add_argument(
        "--train", action="store_true",
        help="train each variant via apps/train_detector.py (requires "
        "--images/--labels) and record best mAP@0.5",
    )
    p.add_argument("--images", default=None)
    p.add_argument("--labels", default=None)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument(
        "--train_args", default="",
        help="extra args passed through to train_detector (space-split)",
    )
    p.add_argument("--output", default="runs/ablation")
    args = p.parse_args(argv)

    if args.train and not (args.images and args.labels):
        print("error: --train requires --images and --labels", file=sys.stderr)
        return 2
    try:
        widths = [float(w) for w in args.widths.split(",") if w]
        depths = [float(d) for d in args.depths.split(",") if d]
        extra = [
            tuple(float(v) for v in combo.split(":"))
            for combo in args.extra.split(",") if combo
        ]
    except ValueError:
        print(
            "error: --widths/--depths are comma lists of floats; --extra "
            "is 'w:d,w:d'", file=sys.stderr,
        )
        return 2

    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from litepi_tpu.core.types import ablation_configs
    from litepi_tpu.models import YoloLitePi

    os.makedirs(args.output, exist_ok=True)
    cfgs = ablation_configs(
        width_scales=tuple(widths),
        depth_scales=tuple(depths),
        extra=tuple(extra),
        num_classes=args.num_classes,
    )
    # same combo order ablation_configs builds internally
    combos = [(w, d) for d in depths for w in widths]
    combos += [c for c in extra if c not in combos]
    rows = []
    for cfg, (w, d) in zip(cfgs, combos):
        model = YoloLitePi(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 64, 64, 3), np.float32),
            train=False,
        )
        params = sum(
            int(np.prod(x.shape))
            for x in jax.tree_util.tree_leaves(variables["params"])
        )
        # forward FLOPs at deploy resolution, from XLA's own cost model
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, train=False)
        ).lower(
            jax.eval_shape(lambda: variables),
            jax.ShapeDtypeStruct(
                (1, args.imgsz, args.imgsz, 3), jnp.float32
            ),
        )
        try:  # newer jax: analysis straight off the lowering (no compile)
            analysis = lowered.cost_analysis()
        except (AttributeError, NotImplementedError):
            analysis = None
        if analysis is None:  # some backends only report post-compile
            analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):  # older jax returns [dict]
            analysis = analysis[0]
        gflops = float((analysis or {}).get("flops", 0.0)) / 1e9

        fps = None
        if args.bench:
            x = jnp.zeros(
                (args.bench_batch, args.imgsz, args.imgsz, 3), jnp.float32
            )
            iters = args.bench_iters

            @jax.jit
            def timed(v, xb):
                def body(carry, _):
                    out = model.apply(v, carry, train=False)
                    bump = (out["cls"].max() % 1.0).astype(carry.dtype)
                    return carry.at[0, 0, 0, 0].add(bump), out["cls"].max()
                _, outs = jax.lax.scan(body, xb, None, length=iters)
                return outs

            np.asarray(timed(variables, x))  # compile + 1 discarded run
            t0 = time.perf_counter()
            np.asarray(timed(variables, x))
            fps = args.bench_batch * iters / (time.perf_counter() - t0)

        map50 = best_epoch = None
        if args.train:
            import json

            from litepi_tpu.apps.train_detector import main as train_main

            run_dir = os.path.join(args.output, cfg.name)
            rc = train_main(
                [
                    "--images", args.images, "--labels", args.labels,
                    # val defaults to the train set (the notebook's runs
                    # used Ultralytics' own split); override in
                    # --train_args (later occurrences win in argparse)
                    "--val_images", args.images,
                    "--val_labels", args.labels,
                    "--num_classes", str(args.num_classes),
                    "--imgsz", str(args.imgsz),
                    "--epochs", str(args.epochs),
                    "--width_scale", str(w), "--depth_scale", str(d),
                    "--output", run_dir,
                ]
                + [a for a in args.train_args.split() if a]
            )
            if rc != 0:
                print(
                    f"error: training {cfg.name} failed (rc {rc})",
                    file=sys.stderr,
                )
                return rc
            with open(os.path.join(run_dir, "results.json")) as f:
                res = json.load(f)
            map50, best_epoch = res["best_map50"], res["best_epoch"]

        row = {
            "name": cfg.name,
            "width_scale": w,
            "depth_scale": d,
            "params": params,
            "gflops": round(gflops, 3),
            "fps": round(fps, 1) if fps is not None else "",
            "map50": map50 if map50 is not None else "",
            "best_epoch": best_epoch if best_epoch is not None else "",
        }
        rows.append(row)
        print(
            f"{cfg.name}: {params / 1e6:.2f}M params, {gflops:.2f} GFLOPs"
            + (f", {row['fps']} fps" if fps is not None else "")
            + (f", mAP50 {map50}" if map50 is not None else "")
        )

    out_csv = os.path.join(args.output, "ablation_results.csv")
    with open(out_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {out_csv} ({len(rows)} variants)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
