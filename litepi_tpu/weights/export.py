"""Portable program export via StableHLO.

The reference's deployment story is export-to-engine-format: torch -> ONNX ->
pnnx/NCNN and OpenVINO IR (reference: src/*/convert-model-classify.ipynb
cells 3-12, convert_model_detect.ipynb).  The XLA-native equivalent of those
engine artifacts is a serialized StableHLO program (``jax.export``): a
self-contained, version-stable module another process (or another language's
PJRT runtime) can load and execute without the Python model code.

    blob = export_program(pipe.make_exportable(), example_args)
    path.write_bytes(blob)
    ...
    fn = load_program(path.read_bytes())
    out = fn(*args)

Weights are baked into the exported module as constants (the engine-artifact
convention the reference follows: .param+.bin pairs, .onnx with weights).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np


def export_program(fn: Callable, example_args: Sequence[Any]) -> bytes:
    """Serialize ``fn`` (shaped by ``example_args``) to StableHLO bytes."""
    from jax import export as jax_export

    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        tuple(example_args),
    )
    exported = jax_export.export(jax.jit(fn))(*specs)
    return bytes(exported.serialize())  # serialize() returns a bytearray


def load_program(data: bytes) -> Callable:
    """Deserialize StableHLO bytes into a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(data)
    return exported.call


def export_classifier(
    arch: str,
    variables: Any,
    num_classes: int,
    input_size: int = 64,
    batch: int = 1,
) -> bytes:
    """Export a classifier's inference program with weights baked in —
    the analogue of the reference's per-classifier ONNX/NCNN exports."""
    from litepi_tpu.models import build_classifier

    model = build_classifier(arch, num_classes)
    host_vars = jax.device_get(variables)

    def infer(x):
        return model.apply(host_vars, x, train=False)

    example = np.zeros((batch, input_size, input_size, 3), np.float32)
    return export_program(infer, (example,))


def export_detector(
    det_model: Any,
    variables: Any,
    input_size: int = 640,
    batch: int = 1,
) -> bytes:
    """Export a detector's raw-head inference program ({reg, cls} contract)."""
    host_vars = jax.device_get(variables)

    def infer(x):
        return det_model.apply(host_vars, x, train=False)

    example = np.zeros((batch, input_size, input_size, 3), np.float32)
    return export_program(infer, (example,))
