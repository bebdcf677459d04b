"""Weight conversion CLI.

Re-creates the reference's model-export capability in the direction this
framework needs: where the reference converts torch -> ONNX -> NCNN/OpenVINO
(reference: src/*/convert-model-classify.ipynb cells 3-12,
convert_model_detect.ipynb), here torch ``.pth`` classifier state dicts (and
any orbax pytree) convert into orbax checkpoints the pipeline loads directly.

    python -m litepi_tpu.apps.convert \
        --arch shufflenetv2 --num_classes 91 \
        --input weights/shufflenetv2.pth --output ckpt/shufflenetv2

A smoke test runs after conversion (the reference ships pnnx-generated
``test_inference`` smoke scripts with every export — model_ncnn.py:5-26):
a seeded input through the converted Flax model must produce finite outputs
of the right shape.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Convert torch weights -> orbax")
    p.add_argument(
        "--arch", required=True,
        choices=["shufflenetv2", "resnet18", "mobilenetv2", "efficientnet"],
    )
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--input", required=True, help="torch .pth state dict")
    p.add_argument("--output", required=True, help="orbax checkpoint dir")
    p.add_argument("--input_size", type=int, default=64)
    args = p.parse_args(argv)

    import numpy as np

    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.checkpoint import save_checkpoint
    from litepi_tpu.weights.torch_import import (
        convert_classifier_state_dict,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(args.input)
    variables = convert_classifier_state_dict(args.arch, sd)

    # export smoke test: seeded input -> finite logits of the right shape
    model = build_classifier(args.arch, args.num_classes)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, args.input_size, args.input_size, 3)).astype(
        np.float32
    )
    out = np.asarray(model.apply(variables, x, train=False))
    if out.shape != (1, args.num_classes) or not np.isfinite(out).all():
        print(
            f"error: converted model failed the smoke test "
            f"(shape {out.shape}, finite={np.isfinite(out).all()})",
            file=sys.stderr,
        )
        return 1

    save_checkpoint(args.output, variables)
    print(
        f"converted {args.input} ({args.arch}, {args.num_classes} classes) "
        f"-> {args.output}; smoke logits[0,:3]={out[0, :3].round(4).tolist()}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
