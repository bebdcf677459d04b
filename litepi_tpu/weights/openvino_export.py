"""OpenVINO IR (``.xml`` + ``.bin``) detector-graph EMISSION.

The reference deploys OpenVINO IR as one of its three backends
(runner.py:175-222 compiles it; artifacts src/*/convert/model/*/
*_openvino_model/).  This module rebuilds that converter TPU-side: Flax
variables -> the exact IR vocabulary the real ``yolo_plus.xml`` uses —
Convolution + anonymous-bias Add + Swish per fused conv, VariadicSplit
C2f branches, opset14 MaxPool SPPF, opset11 scales-mode Interpolate, the
DFL Reshape/Transpose/SoftMax/Convolution chain, and torch's ``chunk(2)``
traced as the prim::ListUnpack ShapeOf/Gather/Divide/Mod/Greater/Convert
subgraph (yolo_plus.xml layers 389-400).  Unlike NCNN params or ONNX,
IR carries explicit per-port shapes on every edge, so the emitter runs
full shape inference while building.

Validation is closed-loop (tests/test_openvino_export.py):

* layer inventory parity with the REAL surviving v1 IR — named layers
  (``__module.*`` / ``self.*``) compared one-by-one on (type, attrs,
  output shapes), anonymous layers as multisets, constant values
  bit-compared;
* the emitted IR executes through
  :func:`litepi_tpu.weights.openvino_import.run_ir_graph` — itself
  validated bit-exact against the NCNN interpreter on the real export —
  and matches the real IR's output bit-for-bit when carrying the same
  weights;
* :func:`litepi_tpu.weights.openvino_import.convert_detector_openvino`
  re-ingests the emitted pair to bit-identical variables.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from litepi_tpu.core.types import DetectorConfig

# numpy dtype -> (IR element_type, port precision)
_DTYPE_MAP = {
    np.dtype(np.float32): ("f32", "FP32"),
    np.dtype(np.float16): ("f16", "FP16"),
    np.dtype(np.int64): ("i64", "I64"),
    np.dtype(np.int32): ("i32", "I32"),
    np.dtype(np.bool_): ("boolean", "BOOL"),
}

# the traced SiLU module is deduplicated by torch to one shared object,
# so every Swish in the real export carries the LAST act module's path
# (yolo_plus.xml: all 57 Swish layers are named model.22.cv3.2.1.act)
_SHARED_ACT = "__module.model.22.cv3.2.1.act/aten::silu_/Swish"


@dataclasses.dataclass
class _Value:
    """A produced tensor: (layer id, output port id, shape, precision)."""

    layer: int
    port: int
    shape: Tuple[int, ...]
    precision: str


class _IrEmitter:
    """Builds the OpenVINO IR layer/edge/blob set for the yolo_plus / v8
    family (C2f backbone+neck, model.22 DFL head) from a fused state
    dict.  Layer naming follows the real export's torch-trace
    conventions so structural tests can compare named inventories."""

    def __init__(self, cfg: DetectorConfig, sd: Mapping[str, np.ndarray]):
        self.cfg = cfg
        self.sd = sd
        # layer dicts: id,name,type,version,data,in_ports,out_ports
        self.layers: List[Dict] = []
        self.edges: List[Tuple[int, int, int, int]] = []
        self.blob = bytearray()
        self._blob_index: Dict[bytes, int] = {}
        self._anon = 0
        self._act_count = 0

    # ------------------------------------------------------------------ #
    # low-level graph assembly
    # ------------------------------------------------------------------ #

    def _layer(
        self,
        ltype: str,
        name: str,
        version: str,
        data: Optional[Dict[str, str]],
        ins: Sequence[_Value],
        outs: Sequence[Tuple[Tuple[int, ...], str]],
        out_names: Optional[Sequence[Optional[str]]] = None,
    ) -> List[_Value]:
        lid = len(self.layers)
        in_ports = []
        for tp, v in enumerate(ins):
            self.edges.append((v.layer, v.port, lid, tp))
            in_ports.append({"id": tp, "shape": v.shape, "precision": v.precision})
        out_ports = []
        values = []
        for i, (shape, prec) in enumerate(outs):
            pid = len(ins) + i
            pname = out_names[i] if out_names else None
            out_ports.append(
                {"id": pid, "shape": shape, "precision": prec, "names": pname}
            )
            values.append(_Value(lid, pid, tuple(shape), prec))
        self.layers.append(
            {
                "id": lid, "name": name, "type": ltype, "version": version,
                "data": data or {}, "in": in_ports, "out": out_ports,
            }
        )
        return values

    def _const(
        self, name: str, arr: np.ndarray, port_name: Optional[str] = None
    ) -> _Value:
        # np.ascontiguousarray would promote 0-d scalars to 1-d; the IR
        # distinguishes scalar consts (shape="") from 1-element vectors
        arr = np.asarray(arr, order="C")
        etype, prec = _DTYPE_MAP[arr.dtype]
        raw = arr.tobytes()
        # identical payloads share one blob region (the real export stores
        # its repeated scalar axis consts at one offset — layers 17/377)
        off = self._blob_index.get(raw)
        if off is None:
            off = len(self.blob)
            self.blob += raw
            self._blob_index[raw] = off
        data = {
            "element_type": etype,
            "shape": ", ".join(str(d) for d in arr.shape),
            "offset": str(off),
            "size": str(len(raw)),
        }
        return self._layer(
            "Const", name, "opset1", data, [], [(arr.shape, prec)],
            out_names=[port_name],
        )[0]

    def _anon_const(self, arr: np.ndarray) -> _Value:
        self._anon += 1
        return self._const(f"Constant_{self._anon}", arr)

    # ------------------------------------------------------------------ #
    # model blocks
    # ------------------------------------------------------------------ #

    def _swish(self, x: _Value) -> _Value:
        sfx = "" if self._act_count == 0 else f"_{self._act_count}"
        self._act_count += 1
        return self._layer(
            "Swish", f"{_SHARED_ACT}{sfx}", "opset4", None, [x],
            [(x.shape, "FP32")],
        )[0]

    def _conv(
        self, x: _Value, path: str, k: int, stride: int = 1, act: bool = True
    ) -> _Value:
        stem = path if f"{path}.weight" in self.sd else f"{path}.conv"
        w = np.ascontiguousarray(self.sd[f"{stem}.weight"], np.float32)
        out_c = w.shape[0]
        pad = k // 2
        h = (x.shape[2] + 2 * pad - k) // stride + 1
        ww = (x.shape[3] + 2 * pad - k) // stride + 1
        wc = self._const(f"self.{stem}.weight", w, port_name=f"self.{stem}.weight")
        mod = f"__module.{stem}/aten::_convolution"
        y = self._layer(
            "Convolution", f"{mod}/Convolution", "opset1",
            {
                "strides": f"{stride}, {stride}",
                "dilations": "1, 1",
                "pads_begin": f"{pad}, {pad}",
                "pads_end": f"{pad}, {pad}",
                "auto_pad": "explicit",
            },
            [x, wc], [((1, out_c, h, ww), "FP32")],
        )[0]
        bias = self.sd.get(f"{stem}.bias")
        if bias is not None:
            bc = self._const(
                f"{mod}/Reshape",
                np.ascontiguousarray(bias, np.float32).reshape(1, -1, 1, 1),
            )
            y = self._layer(
                "Add", f"{mod}/Add", "opset1", {"auto_broadcast": "numpy"},
                [y, bc], [(y.shape, "FP32")],
            )[0]
        return self._swish(y) if act else y

    def _c2f(
        self, x: _Value, prefix: str, out_c: int, n: int, residual: bool
    ) -> _Value:
        h = out_c // 2
        y = self._conv(x, f"{prefix}.cv1", 1)
        axis = self._const(str(self._next_tensor_id()), np.int64(1))
        sizes = self._anon_const(np.asarray([h, h], np.int64))
        half_shape = (1, h, y.shape[2], y.shape[3])
        halves = self._layer(
            "VariadicSplit",
            f"__module.{prefix}/aten::split_with_sizes/VariadicSplit",
            "opset1", None, [y, axis, sizes],
            [(half_shape, "FP32"), (half_shape, "FP32")],
        )
        parts = list(halves)
        cur = halves[1]
        for j in range(n):
            t = self._conv(cur, f"{prefix}.m.{j}.cv1", 3)
            t = self._conv(t, f"{prefix}.m.{j}.cv2", 3)
            if residual:
                t = self._layer(
                    "Add", f"__module.{prefix}.m.{j}/aten::add/Add",
                    "opset1", {"auto_broadcast": "numpy"},
                    [cur, t], [(t.shape, "FP32")],
                )[0]
            parts.append(t)
            cur = t
        cat_c = sum(p.shape[1] for p in parts)
        cat = self._layer(
            "Concat", f"__module.{prefix}/aten::cat/Concat", "opset1",
            {"axis": "1"}, parts,
            [((1, cat_c, y.shape[2], y.shape[3]), "FP32")],
        )[0]
        return self._conv(cat, f"{prefix}.cv2", 1)

    def _next_tensor_id(self) -> int:
        # the real export names split-axis consts with bare trace-tensor
        # numbers ('109', '727'); a fresh counter keeps ours unique
        self._anon += 1
        return 100 + self._anon

    def _maxpool(self, x: _Value, name: str) -> _Value:
        return self._layer(
            "MaxPool", name, "opset14",
            {
                "strides": "1, 1", "dilations": "1, 1",
                "pads_begin": "2, 2", "pads_end": "2, 2",
                "kernel": "5, 5", "rounding_type": "floor",
                "auto_pad": "explicit", "index_element_type": "i64",
                "axis": "2",
            },
            [x], [(x.shape, "FP32"), (x.shape, "I64")],
        )[0]

    def _sppf(self, x: _Value) -> _Value:
        y = self._conv(x, "model.9.cv1", 1)
        p1 = self._maxpool(y, "__module.model.9.m/aten::max_pool2d/MaxPool")
        p2 = self._maxpool(p1, "__module.model.9.m/aten::max_pool2d/MaxPool_1")
        p3 = self._maxpool(p2, "__module.model.9.m/aten::max_pool2d/MaxPool_2")
        cat = self._layer(
            "Concat", "__module.model.9/aten::cat/Concat", "opset1",
            {"axis": "1"}, [y, p1, p2, p3],
            [((1, 4 * y.shape[1], y.shape[2], y.shape[3]), "FP32")],
        )[0]
        return self._conv(cat, "model.9.cv2", 1)

    def _upsample(self, x: _Value, idx: int) -> _Value:
        mod = f"__module.model.{idx}/aten::upsample_nearest2d"
        scales = self._const(f"{mod}/Multiply", np.asarray([2.0, 2.0], np.float32))
        axes = self._anon_const(np.asarray([2, 3], np.int32))
        out = (1, x.shape[1], x.shape[2] * 2, x.shape[3] * 2)
        return self._layer(
            "Interpolate", f"{mod}/Interpolate", "opset11",
            {
                "mode": "nearest", "shape_calculation_mode": "scales",
                "coordinate_transformation_mode": "asymmetric",
                "nearest_mode": "floor", "antialias": "false",
                "pads_begin": "0, 0, 0, 0", "pads_end": "0, 0, 0, 0",
                "cube_coeff": "-0.75",
            },
            [x, scales, axes], [(out, "FP32")],
        )[0]

    # ------------------------------------------------------------------ #
    # whole graph
    # ------------------------------------------------------------------ #

    def build(self) -> None:
        cfg = self.cfg
        c, d = cfg.channels, cfg.depths
        n_neck = d[0]
        sc = cfg.neck_shortcut
        s = cfg.input_size

        x = self._layer(
            "Parameter", "x", "opset1",
            {"shape": f"1,3,{s},{s}", "element_type": "f32"},
            [], [((1, 3, s, s), "FP32")], out_names=["x"],
        )[0]
        x = self._conv(x, "model.0", 3, 2)
        x = self._conv(x, "model.1", 3, 2)
        x = self._c2f(x, "model.2", c[1], d[0], True)
        x = self._conv(x, "model.3", 3, 2)
        p3 = self._c2f(x, "model.4", c[2], d[1], True)
        x = self._conv(p3, "model.5", 3, 2)
        p4 = self._c2f(x, "model.6", c[3], d[2], True)
        x = self._conv(p4, "model.7", 3, 2)
        x = self._c2f(x, "model.8", c[4], d[3], True)
        p5 = self._sppf(x)

        up = self._upsample(p5, 10)
        t4 = self._layer(
            "Concat", "__module.model.11/aten::cat/Concat", "opset1",
            {"axis": "1"}, [up, p4],
            [((1, up.shape[1] + p4.shape[1], up.shape[2], up.shape[3]), "FP32")],
        )[0]
        t4 = self._c2f(t4, "model.12", c[3], n_neck, sc)
        up = self._upsample(t4, 13)
        t3 = self._layer(
            "Concat", "__module.model.14/aten::cat/Concat", "opset1",
            {"axis": "1"}, [up, p3],
            [((1, up.shape[1] + p3.shape[1], up.shape[2], up.shape[3]), "FP32")],
        )[0]
        n3 = self._c2f(t3, "model.15", c[2], n_neck, sc)
        dconv = self._conv(n3, "model.16", 3, 2)
        b4 = self._layer(
            "Concat", "__module.model.17/aten::cat/Concat", "opset1",
            {"axis": "1"}, [dconv, t4],
            [((1, dconv.shape[1] + t4.shape[1], dconv.shape[2], dconv.shape[3]), "FP32")],
        )[0]
        n4 = self._c2f(b4, "model.18", c[3], n_neck, sc)
        dconv = self._conv(n4, "model.19", 3, 2)
        b5 = self._layer(
            "Concat", "__module.model.20/aten::cat/Concat", "opset1",
            {"axis": "1"}, [dconv, p5],
            [((1, dconv.shape[1] + p5.shape[1], dconv.shape[2], dconv.shape[3]), "FP32")],
        )[0]
        n5 = self._c2f(b5, "model.21", c[4], n_neck, sc)
        self._head_decode((n3, n4, n5))

    def _head_decode(self, levels: Sequence[_Value]) -> None:
        from litepi_tpu.ops.anchors import make_anchors

        cfg = self.cfg
        reg_max, nc = cfg.reg_max, cfg.num_classes
        no = 4 * reg_max + nc
        A = cfg.num_anchors
        anchor_points, strides_arr = make_anchors(cfg.input_size, cfg.strides)
        anchors_c = self._const(
            "__module.model.22/aten::unsqueeze/Unsqueeze",
            np.ascontiguousarray(anchor_points.T.astype(np.float32))[None],
            port_name="anchor_points",
        )
        h = "__module.model.22"

        flats = []
        for i, lvl in enumerate(levels):
            r = self._conv(lvl, f"model.22.cv2.{i}.0", 3)
            r = self._conv(r, f"model.22.cv2.{i}.1", 3)
            r = self._conv(r, f"model.22.cv2.{i}.2", 1, act=False)
            cl = self._conv(lvl, f"model.22.cv3.{i}.0", 3)
            cl = self._conv(cl, f"model.22.cv3.{i}.1", 3)
            cl = self._conv(cl, f"model.22.cv3.{i}.2", 1, act=False)
            sfx = "" if i == 0 else f"_{i}"
            cat = self._layer(
                "Concat", f"{h}/aten::cat/Concat{sfx}", "opset1",
                {"axis": "1"}, [r, cl],
                [((1, no, r.shape[2], r.shape[3]), "FP32")],
            )[0]
            shape_c = self._anon_const(np.asarray([1, no, -1], np.int64))
            flats.append(
                self._layer(
                    "Reshape", f"{h}/aten::view/Reshape{sfx}", "opset1",
                    {"special_zero": "false"}, [cat, shape_c],
                    [((1, no, cat.shape[2] * cat.shape[3]), "FP32")],
                )[0]
            )
        full = self._layer(
            "Concat", f"{h}/aten::cat/Concat_3", "opset1", {"axis": "2"},
            flats, [((1, no, A), "FP32")],
        )[0]
        axis_c = self._const(str(self._next_tensor_id()), np.int64(1))
        sizes_c = self._anon_const(np.asarray([4 * reg_max, nc], np.int64))
        box, cls = self._layer(
            "VariadicSplit", f"{h}/aten::split_with_sizes/VariadicSplit",
            "opset1", None, [full, axis_c, sizes_c],
            [((1, 4 * reg_max, A), "FP32"), ((1, nc, A), "FP32")],
        )

        # DFL: (1,4r,A) -> (1,4,r,A) -> transpose (1,r,4,A) -> softmax over
        # bins -> expectation conv -> (1,4,A)  (yolo_plus.xml:380-388)
        dfl = "__module.model.22.dfl"
        shape_c = self._anon_const(np.asarray([1, 4, reg_max, A], np.int64))
        t = self._layer(
            "Reshape", f"{dfl}/aten::view/Reshape", "opset1",
            {"special_zero": "false"}, [box, shape_c],
            [((1, 4, reg_max, A), "FP32")],
        )[0]
        perm_c = self._const(
            f"{dfl}/aten::transpose/Constant",
            np.asarray([0, 2, 1, 3], np.int32),
        )
        t = self._layer(
            "Transpose", f"{dfl}/aten::transpose/Transpose", "opset1",
            None, [t, perm_c], [((1, reg_max, 4, A), "FP32")],
        )[0]
        t = self._layer(
            "SoftMax", f"{dfl}/aten::softmax/Softmax", "opset8",
            {"axis": "1"}, [t], [(t.shape, "FP32")],
        )[0]
        dfl_w = self._const(
            "self.model.22.dfl.conv.weight",
            np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1),
            port_name="self.model.22.dfl.conv.weight",
        )
        t = self._layer(
            "Convolution", f"{dfl}.conv/aten::_convolution/Convolution",
            "opset1",
            {
                "strides": "1, 1", "dilations": "1, 1",
                "pads_begin": "0, 0", "pads_end": "0, 0",
                "auto_pad": "explicit",
            },
            [t, dfl_w], [((1, 1, 4, A), "FP32")],
        )[0]
        shape_c = self._anon_const(np.asarray([1, 4, A], np.int64))
        dist = self._layer(
            "Reshape", f"{dfl}/aten::view/Reshape_1", "opset1",
            {"special_zero": "false"}, [t, shape_c],
            [((1, 4, A), "FP32")],
        )[0]

        # torch chunk(2, dim=1) traced as a dynamic split-size subgraph
        # (yolo_plus.xml layers 389-400): sizes = [n//2 + (n%2>0), -1]
        lu = f"{h}/prim::ListUnpack"
        shape_of = self._layer(
            "ShapeOf", f"{lu}/ShapeOf", "opset3", {"output_type": "i32"},
            [dist], [((3,), "I32")],
        )[0]
        zero_c = self._anon_const(np.asarray([0], np.int32))
        gathered = self._layer(
            "Gather", f"{lu}/Gather", "opset8", {"batch_dims": "0"},
            [shape_of, axis_c, zero_c], [((), "I32")],
        )[0]
        two_c = self._const(f"{lu}/Convert", np.int32(2))
        div = self._layer(
            "Divide", f"{lu}/Divide", "opset1",
            {"auto_broadcast": "numpy", "m_pythondiv": "true"},
            [gathered, two_c], [((), "I32")],
        )[0]
        mod = self._layer(
            "Mod", f"{lu}/Mod", "opset1", {"auto_broadcast": "numpy"},
            [gathered, two_c], [((), "I32")],
        )[0]
        gt = self._layer(
            "Greater", f"{lu}/Greater", "opset1", {"auto_broadcast": "numpy"},
            [mod, zero_c], [((1,), "BOOL")],
        )[0]
        conv_i = self._layer(
            "Convert", f"{lu}/Convert_0", "opset1",
            {"destination_type": "i32"}, [gt], [((1,), "I32")],
        )[0]
        first = self._layer(
            "Add", f"{lu}/Add", "opset1", {"auto_broadcast": "numpy"},
            [div, conv_i], [((1,), "I32")],
        )[0]
        neg1_c = self._anon_const(np.asarray([-1], np.int32))
        sizes_dyn = self._layer(
            "Concat", f"{lu}/Concat", "opset1", {"axis": "0"},
            [first, neg1_c], [((2,), "I32")],
        )[0]
        lt, rb = self._layer(
            "VariadicSplit", f"{lu}/VariadicSplit", "opset1", None,
            [dist, axis_c, sizes_dyn],
            [((1, 2, A), "FP32"), ((1, 2, A), "FP32")],
        )

        x1y1 = self._layer(
            "Subtract", f"{h}/aten::sub/Subtract", "opset1",
            {"auto_broadcast": "numpy"}, [anchors_c, lt],
            [((1, 2, A), "FP32")],
        )[0]
        x2y2 = self._layer(
            "Add", f"{h}/aten::add/Add", "opset1",
            {"auto_broadcast": "numpy"}, [anchors_c, rb],
            [((1, 2, A), "FP32")],
        )[0]
        csum = self._layer(
            "Add", f"{h}/aten::add/Add_1", "opset1",
            {"auto_broadcast": "numpy"}, [x1y1, x2y2],
            [((1, 2, A), "FP32")],
        )[0]
        half_c = self._anon_const(np.asarray([2.0], np.float32).reshape(1, 1, 1))
        cxy = self._layer(
            "Divide", f"{h}/aten::div/Divide", "opset1",
            {"auto_broadcast": "numpy", "m_pythondiv": "true"},
            [csum, half_c], [((1, 2, A), "FP32")],
        )[0]
        wh = self._layer(
            "Subtract", f"{h}/aten::sub/Subtract_1", "opset1",
            {"auto_broadcast": "numpy"}, [x2y2, x1y1],
            [((1, 2, A), "FP32")],
        )[0]
        xywh = self._layer(
            "Concat", f"{h}/aten::cat/Concat_4", "opset1", {"axis": "1"},
            [cxy, wh], [((1, 4, A), "FP32")],
        )[0]
        strides_c = self._anon_const(
            np.ascontiguousarray(
                strides_arr.astype(np.float32).reshape(1, 1, -1)
            )
        )
        dbox = self._layer(
            "Multiply", f"{h}/aten::mul/Multiply", "opset1",
            {"auto_broadcast": "numpy"}, [xywh, strides_c],
            [((1, 4, A), "FP32")],
        )[0]
        sig = self._layer(
            "Sigmoid", f"{h}/aten::sigmoid/Sigmoid", "opset1", None,
            [cls], [((1, nc, A), "FP32")],
        )[0]
        out = self._layer(
            "Concat", f"{h}/aten::cat/Concat_5", "opset1", {"axis": "1"},
            [dbox, sig], [((1, 4 + nc, A), "FP32")],
        )[0]
        self._layer("Result", "Result_0", "opset1", None, [out], [])


# --------------------------------------------------------------------------- #
# serialization + public entry points
# --------------------------------------------------------------------------- #


def _port_xml(port: Dict, out: List[str]) -> None:
    names = port.get("names")
    attr = f' names="{names}"' if names else ""
    if port["shape"]:
        out.append(f'\t\t\t\t<port id="{port["id"]}" precision="{port["precision"]}"{attr}>')
        for d in port["shape"]:
            out.append(f"\t\t\t\t\t<dim>{d}</dim>")
        out.append("\t\t\t\t</port>")
    else:
        out.append(
            f'\t\t\t\t<port id="{port["id"]}" precision="{port["precision"]}"{attr} />'
        )


def ir_xml_bytes(
    layers: Sequence[Dict],
    edges: Sequence[Tuple[int, int, int, int]],
    name: str = "Model0",
) -> bytes:
    """Assemble the ``.xml`` text (net version 11, the real export's)."""
    from xml.sax.saxutils import quoteattr

    out: List[str] = ['<?xml version="1.0"?>', f'<net name="{name}" version="11">']
    out.append("\t<layers>")
    for l in layers:
        out.append(
            f'\t\t<layer id="{l["id"]}" name={quoteattr(l["name"])} '
            f'type="{l["type"]}" version="{l["version"]}">'
        )
        if l["data"]:
            attrs = " ".join(
                f'{k}={quoteattr(v)}' for k, v in l["data"].items()
            )
            out.append(f"\t\t\t<data {attrs} />")
        if l["in"]:
            out.append("\t\t\t<input>")
            for p in l["in"]:
                _port_xml(p, out)
            out.append("\t\t\t</input>")
        if l["out"]:
            out.append("\t\t\t<output>")
            for p in l["out"]:
                _port_xml(p, out)
            out.append("\t\t\t</output>")
        out.append("\t\t</layer>")
    out.append("\t</layers>")
    out.append("\t<edges>")
    for f, fp, t, tp in edges:
        out.append(
            f'\t\t<edge from-layer="{f}" from-port="{fp}" '
            f'to-layer="{t}" to-port="{tp}" />'
        )
    out.append("\t</edges>")
    out.append("\t<rt_info>")
    out.append("\t\t<conversion_parameters>")
    out.append('\t\t\t<framework value="litepi_tpu" />')
    out.append("\t\t</conversion_parameters>")
    out.append("\t</rt_info>")
    out.append("</net>")
    return ("\n".join(out) + "\n").encode("utf-8")


def build_detector_ir(
    cfg: DetectorConfig, sd: Mapping[str, np.ndarray]
) -> Tuple[bytes, bytes]:
    """Fused state dict + config -> (``.xml`` bytes, ``.bin`` bytes) for a
    yolo_plus/v8-family detector, in-graph decode, ``x`` -> (1, 4+nc, A)."""
    em = _IrEmitter(cfg, sd)
    em.build()
    return ir_xml_bytes(em.layers, em.edges, name=cfg.name), bytes(em.blob)


def export_detector_openvino(
    variables: Dict, cfg: DetectorConfig, xml_path: str,
    bin_path: Optional[str] = None,
) -> Tuple[bytes, bytes]:
    """Write a deployable IR pair for a yolo_plus/v8-family detector —
    the reference's OpenVINO backend format (runner.py:183 compiles it).
    Accepts training- or deploy-form variables."""
    from litepi_tpu.weights.ncnn_export import detector_fused_state_dict

    sd = detector_fused_state_dict(variables, cfg)
    xml_data, bin_data = build_detector_ir(cfg, sd)
    if bin_path is None:
        bin_path = xml_path[: -len(".xml")] + ".bin" if xml_path.endswith(
            ".xml"
        ) else xml_path + ".bin"
    with open(xml_path, "wb") as f:
        f.write(xml_data)
    with open(bin_path, "wb") as f:
        f.write(bin_data)
    return xml_data, bin_data
