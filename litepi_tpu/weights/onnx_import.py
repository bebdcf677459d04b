"""ONNX graph-initializer importer (dependency-free).

The reference's artifact flow starts from ``.onnx`` exports
(reference: src/tt100k/convert/model/*/ *.onnx, convert_model_detect.ipynb);
this environment ships no ``onnx`` package, so the initializers are read
straight off the protobuf wire format — ~100 lines replace the dependency.
Only the pieces needed to recover weights are decoded: ``ModelProto.graph``
(field 7) -> ``GraphProto.initializer`` (field 5, repeated ``TensorProto``)
-> name / dims / data_type / raw or typed data.

Fused exports are handled: Ultralytics fuses Conv+BN before export, so a
fused graph carries ``X.conv.weight`` + ``X.conv.bias`` and no ``X.bn.*``.
:func:`defuse_state_dict` rebuilds an identity BatchNorm around the fused
bias (scale 1, mean 0, var ``1 - eps`` so the BN divisor is exactly 1),
letting one converter (:func:`litepi_tpu.weights.torch_import.
convert_detector_state_dict`) serve both fused and unfused artifacts.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple, Union

import numpy as np

# flax ConvBN BatchNorm epsilon (models/layers.py) — the defused var must
# compensate it exactly: scale*(x-0)/sqrt((1-eps)+eps) + bias == x + bias
BN_EPS = 1e-3

# ONNX TensorProto.DataType -> numpy dtype (the ones that appear in exports)
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
}


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, Union[int, bytes]]]:
    """Iterate (field_number, wire_type, value) over a protobuf message.
    LEN fields yield bytes; varints yield ints; fixed32/64 yield bytes."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wire == 5:  # fixed32
            val = buf[i : i + 4]
            i += 4
        elif wire == 1:  # fixed64
            val = buf[i : i + 8]
            i += 8
        else:  # groups (3/4) never appear in onnx
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, wire, val


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    """Decode one TensorProto: (name, array)."""
    dims = []
    dtype_code = 1
    name = ""
    raw = None
    float_data = []
    int_data = []
    for field, wire, val in _fields(buf):
        if field == 1:  # dims (packed or unpacked int64)
            if wire == 0:
                dims.append(val)
            else:
                i = 0
                while i < len(val):
                    d, i = _read_varint(val, i)
                    dims.append(d)
        elif field == 2:
            dtype_code = val
        elif field == 4:  # float_data, packed 4-byte floats
            float_data.append(val)
        elif field in (5, 7):  # int32_data / int64_data, packed varints
            i = 0
            while i < len(val):
                d, i = _read_varint(val, i)
                int_data.append(d)
        elif field == 8:
            name = val.decode("utf-8")
        elif field == 9:
            raw = val
    np_dtype = _DTYPES.get(dtype_code)
    if np_dtype is None:
        raise ValueError(f"initializer {name!r}: unsupported dtype {dtype_code}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif float_data:
        arr = np.frombuffer(b"".join(float_data), dtype=np.float32)
    elif int_data:
        arr = np.asarray(int_data, dtype=np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr


def read_onnx_initializers(
    src: Union[str, bytes],
) -> Dict[str, np.ndarray]:
    """All graph initializers of an ONNX file as ``{name: array}`` (float16
    upcast to float32 — Ultralytics exports are often fp16)."""
    data = src if isinstance(src, bytes) else open(src, "rb").read()
    out: Dict[str, np.ndarray] = {}
    for field, _, graph in _fields(data):
        if field != 7:  # ModelProto.graph
            continue
        for gfield, _, tensor in _fields(graph):
            if gfield != 5:  # GraphProto.initializer
                continue
            name, arr = _parse_tensor(tensor)
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            out[name] = arr
    return out


def defuse_state_dict(
    sd: Dict[str, np.ndarray], eps: float = BN_EPS
) -> Dict[str, np.ndarray]:
    """Rebuild identity BatchNorms around fused conv biases.

    For every ``X.conv.weight`` carrying an ``X.conv.bias`` with no sibling
    ``X.bn.*`` (the fused-export signature), move the bias into a synthetic
    BN (scale 1, mean 0, var ``1 - eps``) so the ConvBN module reproduces
    ``conv(x) + bias`` exactly.  Unfused dicts pass through untouched.
    """
    out = dict(sd)
    for key in list(sd):
        if not key.endswith(".conv.weight"):
            continue
        base = key[: -len(".conv.weight")]
        bias_key = f"{base}.conv.bias"
        if f"{base}.bn.weight" in sd or bias_key not in sd:
            continue
        bias = np.asarray(out.pop(bias_key), np.float32)
        n = bias.shape[0]
        out[f"{base}.bn.weight"] = np.ones(n, np.float32)
        out[f"{base}.bn.bias"] = bias
        out[f"{base}.bn.running_mean"] = np.zeros(n, np.float32)
        out[f"{base}.bn.running_var"] = np.full(n, 1.0 - eps, np.float32)
    return out


def convert_detector_onnx(
    src: Union[str, bytes, Dict[str, np.ndarray]], depths=(1, 2, 2, 1)
):
    """ONNX detector export -> litepi_tpu YoloLitePi variables.

    Accepts a path, raw bytes, or pre-read initializers with
    state-dict-style names (``model.{idx}.…`` — the Ultralytics module-list
    layout, fused or unfused)."""
    from litepi_tpu.weights.torch_import import convert_detector_state_dict

    inits = src if isinstance(src, dict) else read_onnx_initializers(src)
    return convert_detector_state_dict(defuse_state_dict(inits), depths)


def convert_classifier_onnx(
    arch: str, src: Union[str, bytes, Dict[str, np.ndarray]]
):
    """ONNX classifier export -> litepi_tpu Flax variables.

    The reference exports its four classifiers torch -> ONNX before the
    NCNN/OpenVINO conversions (reference: src/*/convert-model-classify.ipynb
    cells 3-12); ``torch.onnx.export`` preserves the torchvision state-dict
    parameter names as graph initializers, so the existing per-arch
    converters apply directly.  Requires a name-preserving export (the
    default for these models — constant-folded exports that fuse BatchNorms
    rename their initializers and cannot be mapped back by name).
    """
    from litepi_tpu.weights.torch_import import convert_classifier_state_dict

    inits = src if isinstance(src, dict) else read_onnx_initializers(src)
    try:
        return convert_classifier_state_dict(arch, inits)
    except KeyError as e:
        raise ValueError(
            f"ONNX graph lacks initializer {e.args[0]!r} expected for "
            f"{arch!r}: the export was likely constant-folded (BatchNorms "
            "fused, initializers renamed). Re-export with "
            "do_constant_folding=False, or convert from the .pth instead."
        ) from e
