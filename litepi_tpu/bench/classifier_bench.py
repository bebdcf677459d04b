"""Classifier evaluation: accuracy / macro P-R-F1 / params / size / FPS.

Re-creates the reference's ``evaluation-tsr.ipynb`` capability (cells 6-16):
per-model parameter count, checkpoint size in MB, accuracy and macro
precision/recall/F1 over a crop dataset, FPS via warmup + timed loop, and
single-image top-k inference.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import numpy as np


def count_params(variables) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"]))


def model_size_mb(variables) -> float:
    import jax

    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(variables)
    ) / (1024 * 1024)


def macro_prf1(
    preds: np.ndarray, labels: np.ndarray, num_classes: int
) -> Tuple[float, float, float]:
    eps = 1e-12
    ps, rs = [], []
    for c in range(num_classes):
        tp = int(((preds == c) & (labels == c)).sum())
        fp = int(((preds == c) & (labels != c)).sum())
        fn = int(((preds != c) & (labels == c)).sum())
        if tp + fn == 0:  # class absent from labels: skip, macro over present
            continue
        ps.append(tp / (tp + fp + eps))
        rs.append(tp / (tp + fn + eps))
    p = float(np.mean(ps)) if ps else 0.0
    r = float(np.mean(rs)) if rs else 0.0
    f1 = 2 * p * r / (p + r + 1e-12) if (p + r) else 0.0
    return p, r, f1


def evaluate_classifier(
    arch: str,
    variables,
    images: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    batch: int = 128,
    warmup: int = 2,  # discarded full scans incl. the compile run
    timed_iters: int = 20,
    dtype: str = "float32",
) -> Dict[str, float]:
    """Full classifier report (reference evaluate_model, evaluation-tsr
    cell 6).  ``images``: (N, c, c, 3) normalised float32."""
    import jax
    import jax.numpy as jnp

    from litepi_tpu.models import build_classifier

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = build_classifier(arch, num_classes, dtype=jdtype)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    # accuracy over the dataset in fixed-size chunks
    n = len(images)
    preds = np.zeros(n, np.int64)
    pad_n = int(np.ceil(n / batch) * batch)
    padded = np.concatenate(
        [images, np.zeros((pad_n - n, *images.shape[1:]), images.dtype)]
    )
    for i in range(0, pad_n, batch):
        logits = np.asarray(fwd(variables, padded[i : i + batch]))
        preds[i : min(i + batch, n)] = logits.argmax(-1)[: max(0, min(batch, n - i))]
    acc = float((preds == labels).mean())
    p, r, f1 = macro_prf1(preds, labels, num_classes)

    # FPS: the timed iterations run INSIDE one XLA program (lax.scan with a
    # data dependency between iterations) and the clock stops at a host
    # fetch — on relayed platforms block_until_ready returns early and a
    # per-dispatch loop times the tunnel, not the device (same methodology
    # as bench.py).  Warmup = the compile + one discarded timed run.
    bench = jnp.asarray(padded[:batch])

    @jax.jit
    def timed_run(v, x):
        def body(carry, _):
            logits = model.apply(v, carry, train=False)
            bump = (logits.argmax() % 2).astype(carry.dtype)
            return carry.at[0, 0, 0, 0].add(bump), logits.max()
        _, outs = jax.lax.scan(body, x, None, length=timed_iters)
        return outs

    # ``warmup`` counts discarded runs INCLUDING the compile run (each
    # discarded run is a full timed_iters scan now, so keep it small)
    for _ in range(max(warmup, 1)):
        np.asarray(timed_run(variables, bench))
    t0 = time.perf_counter()
    np.asarray(timed_run(variables, bench))
    dt = time.perf_counter() - t0
    fps = batch * timed_iters / dt

    return {
        "model": arch,
        "accuracy": acc,
        "precision_macro": p,
        "recall_macro": r,
        "f1_macro": f1,
        "params": count_params(variables),
        "size_mb": round(model_size_mb(variables), 2),
        "fps": round(fps, 1),
        "batch": batch,
    }


def confusion_matrix(
    preds: np.ndarray, labels: np.ndarray, num_classes: int
) -> np.ndarray:
    """(num_classes, num_classes) counts, rows = true class, cols =
    predicted (reference: evaluation-tsr.ipynb cell 14's confusion
    analysis)."""
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (labels.astype(np.int64), preds.astype(np.int64)), 1)
    return cm


def confusion_analysis(
    preds: np.ndarray,
    labels: np.ndarray,
    num_classes: int,
    top: int = 10,
    class_names: Optional[Dict[int, str]] = None,
) -> Dict:
    """The reference's per-class error report (evaluation-tsr cell 14):
    most-confused (true -> predicted) pairs and the worst per-class
    accuracies, for classes present in the labels."""
    cm = confusion_matrix(preds, labels, num_classes)
    off = cm.copy()
    np.fill_diagonal(off, 0)

    def name(c: int) -> str:
        return class_names.get(c, str(c)) if class_names else str(c)

    pairs = []
    # descending sort: the first zero ends all non-trivial pairs
    for idx in np.argsort(-off, axis=None)[:top]:
        t, pcl = divmod(int(idx), num_classes)
        if off[t, pcl] == 0:
            break
        pairs.append(
            {
                "true": name(t),
                "pred": name(pcl),
                "count": int(off[t, pcl]),
            }
        )
    support = cm.sum(axis=1)
    present = np.nonzero(support)[0]
    per_class = {
        name(int(c)): float(cm[c, c] / support[c]) for c in present
    }
    worst = sorted(per_class.items(), key=lambda kv: kv[1])[:top]
    return {
        "confusion_matrix": cm,
        "most_confused": pairs,
        "per_class_accuracy": per_class,
        "worst_classes": worst,
    }


def predict_topk(
    arch: str,
    variables,
    image: np.ndarray,
    num_classes: int,
    k: int = 5,
    class_names: Optional[Dict[int, str]] = None,
):
    """Single-image top-k inference (evaluation-tsr cell 16)."""
    import jax

    from litepi_tpu.models import build_classifier

    model = build_classifier(arch, num_classes)
    logits = np.asarray(
        model.apply(variables, image[None], train=False)
    )[0]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    top = np.argsort(-probs)[:k]
    return [
        {
            "class_id": int(c),
            "class_name": class_names.get(int(c), str(int(c)))
            if class_names
            else str(int(c)),
            "prob": float(probs[c]),
        }
        for c in top
    ]
