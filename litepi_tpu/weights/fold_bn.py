"""Fold inference BatchNorm into conv kernels/biases (deploy-form weights).

The reference ships BN-fused graphs (its exported NCNN convs carry bias —
model.ncnn.param); training-side checkpoints here keep Conv(use_bias=False)
+ BatchNorm.  This transform rewrites such variables into the biased-conv
form consumed by ``ConvBN(fused=True)`` models:

    s  = gamma / sqrt(running_var + eps)
    W' = W * s          (per output channel)
    b' = beta - running_mean * s

Exact in float32 — the fused forward equals the unfused inference forward
to rounding.  Motivation is HBM traffic, not FLOPs: unfused inference BN
lowers to a separate elementwise pass over every activation map (measured
~3 ms/step on the B=128 detector, round-2b profile).

The fold math runs in NumPy deliberately: eagerly-dispatched jnp ops here
meant one tiny XLA compile per ConvBN block (~150 compiles x ~0.35 s each
through a remote-compile TPU plugin, measured 38 s of the 57 s pipeline
construction — and each too small for the persistent compilation cache).
Weight-sized elementwise math needs no accelerator.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-3  # litepi_tpu.models.layers.ConvBN's BatchNorm epsilon


def has_batchnorm(variables: Dict[str, Any]) -> bool:
    """True when the variable tree still carries BatchNorm statistics."""
    return bool(variables.get("batch_stats"))


def fold_batchnorm(
    variables: Dict[str, Any], eps: float = BN_EPS
) -> Dict[str, Any]:
    """Return deploy-form variables: every ``{conv, bn}`` sibling pair in
    ``params`` (with matching running stats in ``batch_stats``) becomes a
    biased ``conv``; the ``batch_stats`` collection disappears.

    Nodes without a bn sibling (plain output convs, dense layers) pass
    through unchanged, so the transform is safe on any model built from
    :class:`litepi_tpu.models.layers.ConvBN`-style blocks.  Idempotent:
    already-folded trees (no batch_stats) are returned as-is.
    """
    if not has_batchnorm(variables):
        return {"params": variables["params"]} if "params" in variables else variables

    def fold(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = dict(params)
        keys = set(params) | set(stats)
        # fold every (convX, bnX) sibling pair at this level: 'bn' pairs
        # with 'conv' (the ConvBN blocks), 'bn1' with 'conv1' (ResNet18's
        # torchvision-named stem), etc.
        folded_bns = set()
        for k in list(params):
            if not k.startswith("bn"):
                continue
            conv_key = "conv" + k[2:]
            bn_p, bn_s = params.get(k), stats.get(k)
            if (
                conv_key in params
                and isinstance(bn_p, dict)
                and isinstance(bn_s, dict)
                and "scale" in bn_p
                and "var" in bn_s
            ):
                s = np.asarray(bn_p["scale"]) / np.sqrt(
                    np.asarray(bn_s["var"]) + eps
                )
                conv = dict(params[conv_key])
                # Flax conv kernels are (kh, kw, cin/groups, cout): scale cout
                conv["kernel"] = np.asarray(conv["kernel"]) * s
                # BN(conv(x)+b) = s*(conv(x)+b-mean)+beta: a pre-existing
                # conv bias scales by s too
                base = np.asarray(conv["bias"]) if "bias" in conv else 0.0
                conv["bias"] = (
                    base * s
                    + np.asarray(bn_p["bias"])
                    - np.asarray(bn_s["mean"]) * s
                )
                out[conv_key] = conv
                del out[k]
                folded_bns.add(k)
        for k in keys:
            if k in folded_bns:
                continue
            p, st = out.get(k), stats.get(k)
            if isinstance(p, dict) and isinstance(st, dict):
                out[k] = fold(p, st)
            # stats-only subtree (bn with no conv sibling at this level):
            # a dangling one means a BN this transform cannot fold
            elif p is None and isinstance(st, dict) and _contains_stats(st):
                raise ValueError(
                    f"unfoldable BatchNorm at '{k}': no conv sibling"
                )
        return out

    def _contains_stats(node: Dict[str, Any]) -> bool:
        return "mean" in node or any(
            isinstance(v, dict) and _contains_stats(v) for v in node.values()
        )

    return {"params": fold(variables["params"], variables["batch_stats"])}


def fold_pipeline_vars(
    variables: Dict[str, Any], eps: float = BN_EPS
) -> Tuple[Dict[str, Any], bool]:
    """Pipeline helper: fold when stats are present.  Returns
    ``(variables, fused)`` where ``fused`` says which model form to build."""
    if has_batchnorm(variables):
        return fold_batchnorm(variables, eps=eps), True
    # no stats: either already deploy-form (conv biases present) or a
    # BN-free model; the unfused module form still applies only if params
    # carry bn scale/bias — detect that
    params = variables.get("params", {})

    def any_bn(node) -> bool:
        if not isinstance(node, dict):
            return False
        return "bn" in node or any(any_bn(v) for v in node.values())

    if any_bn(params):
        # bn params without stats cannot run inference correctly anyway
        return variables, False
    return variables, True


def fold_detector_pipeline_vars(
    variables: Dict[str, Any],
) -> Tuple[Dict[str, Any], bool]:
    """Detector variant of :func:`fold_pipeline_vars` (ConvBN eps 1e-3)."""
    return fold_pipeline_vars(variables, eps=BN_EPS)


def fold_stem_input(
    variables: Dict[str, Any],
    scale: float,
    flip_channels: bool,
    stem_path: Tuple[str, ...] = ("backbone", "stem", "conv"),
) -> Dict[str, Any]:
    """Fold an input-side per-channel transform into the stem conv kernel.

    The fused serving program feeds the detector RAW letterbox pixels
    (0..255, host colour order).  The reference normalises on the host
    before inference (``in0 = pixels / 255`` after BGR→RGB,
    e2e.py:224-238); done literally in-graph that is 2-3 full elementwise
    HBM passes over the (B, 640, 640, 3) canvas.  Both transforms are
    linear maps of the conv's INPUT channels, so they fold into the first
    kernel instead::

        conv(flip(x) * s, W)  ==  conv(x, flip_cin(W) * s)

    Exact including zero padding (a pure scale/permutation fixes 0), unlike
    a mean-shift fold.  Only valid on deploy-form (BN-folded) variables —
    an unfused BN after the stem normalises by running stats recorded for
    the UNSCALED activations, so callers must fold BN first.

    Returns a new variables dict; the input tree is not mutated.
    """
    params = variables["params"]
    node = params
    for key in stem_path[:-1]:
        node = node[key]
    conv = dict(node[stem_path[-1]])
    kernel = conv["kernel"]  # Flax layout (kh, kw, cin, cout)
    if flip_channels:
        kernel = kernel[:, :, ::-1, :]
    conv["kernel"] = kernel * scale

    def rebuild(tree: Dict[str, Any], path: Tuple[str, ...]) -> Dict[str, Any]:
        out = dict(tree)
        if len(path) == 1:
            out[path[0]] = conv
        else:
            out[path[0]] = rebuild(tree[path[0]], path[1:])
        return out

    new_vars = dict(variables)
    new_vars["params"] = rebuild(params, stem_path)
    return new_vars
