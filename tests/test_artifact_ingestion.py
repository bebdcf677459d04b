"""Real-artifact ingestion: Ultralytics ``.pt`` training containers and
``.onnx`` exports (fused and unfused), round-trip-tested on synthetic
containers built in-test (the actual reference blobs are stripped —
.MISSING_LARGE_BLOBS).

The ``.pt`` test pickles a DetectionModel-alike under the module path
``ultralytics.nn.tasks`` and then removes that fake module, so unpickling
MUST go through the lenient stub path — exactly the situation of loading a
real Ultralytics checkpoint without the ultralytics package.

The ``.onnx`` tests hand-encode the protobuf wire format (a writer mirror of
the reader) so no onnx package is needed on either side.
"""

import struct
import sys
import types

import numpy as np
import pytest
import torch

from litepi_tpu.core.types import DetectorConfig
from litepi_tpu.models import YoloLitePi
from litepi_tpu.weights.onnx_import import (
    convert_detector_onnx,
    defuse_state_dict,
    read_onnx_initializers,
)
from litepi_tpu.weights.torch_import import (
    convert_detector_state_dict,
    load_torch_state_dict,
    load_ultralytics_container,
)
from tests.torch_refs import randomize_bn_stats
from tests.torch_yolo_ref import YoloV8T

TINY = DetectorConfig(
    name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=64,
    neck_down_base=(256, 512),  # = YOLO_PLUS_V1's PAN (core/types.py)
)


def _torch_model(seed=0):
    torch.manual_seed(seed)
    tm = YoloV8T(
        TINY.channels, TINY.depths, nc=1, reg_max=TINY.reg_max,
        neck_shortcut=TINY.neck_shortcut, neck_down=TINY.neck_down_channels,
    )
    randomize_bn_stats(tm, seed=1)
    tm.eval()
    return tm


# --------------------------------------------------------------------- #
# .pt container
# --------------------------------------------------------------------- #


def _save_ultralytics_like_container(tm, path):
    """Pickle {'model': DetectionModel} with the class claiming to live in
    ultralytics.nn.tasks, then remove the fake package so a later load can
    only succeed through the lenient stub unpickler."""
    DetectionModel = type(
        "DetectionModel", (YoloV8T,), {"__module__": "ultralytics.nn.tasks"}
    )
    fake = DetectionModel.__new__(DetectionModel)
    fake.__dict__.update(tm.__dict__)

    mods = {}
    for name in ("ultralytics", "ultralytics.nn", "ultralytics.nn.tasks"):
        mods[name] = types.ModuleType(name)
        sys.modules[name] = mods[name]
    mods["ultralytics.nn.tasks"].DetectionModel = DetectionModel
    try:
        torch.save(
            {"model": fake.half(), "ema": None, "epoch": 7, "date": "x"},
            path,
        )
    finally:
        for name in mods:
            del sys.modules[name]
    assert "ultralytics" not in sys.modules


def test_pt_container_unwraps_through_stub_path(tmp_path):
    tm = _torch_model()
    want = {k: v.numpy().astype(np.float32) for k, v in tm.state_dict().items()}
    path = str(tmp_path / "best.pt")
    _save_ultralytics_like_container(_torch_model(), path)

    got = load_ultralytics_container(path)
    assert set(got) == set(want)
    for k in want:
        # container was saved fp16 (as Ultralytics does)
        np.testing.assert_allclose(got[k], want[k], atol=2e-3, rtol=2e-3)
    # generic entry point routes containers automatically
    got2 = load_torch_state_dict(path)
    assert set(got2) == set(want)


def test_pt_container_end_to_end_forward_parity(tmp_path):
    """Container -> converter -> Flax forward matches the torch source."""
    tm = _torch_model()
    path = str(tmp_path / "last.pt")
    _save_ultralytics_like_container(_torch_model(), path)

    sd = load_ultralytics_container(path)
    variables = convert_detector_state_dict(sd, TINY.depths)
    fm = YoloLitePi(TINY)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = fm.apply(variables, x, train=False)
    with torch.no_grad():
        reg_t, cls_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    # fp16 container storage dominates the tolerance
    np.testing.assert_allclose(
        np.asarray(out["cls"]), cls_t.numpy(), atol=3e-2, rtol=3e-2
    )


# --------------------------------------------------------------------- #
# .onnx — protobuf writer mirror of the reader
# --------------------------------------------------------------------- #


def _pb_varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_varint((field << 3) | 2) + _pb_varint(len(payload)) + payload


def _pb_int(field: int, value: int) -> bytes:
    return _pb_varint(field << 3) + _pb_varint(value)


_CODES = {np.dtype(np.float32): 1, np.dtype(np.float16): 10,
          np.dtype(np.int64): 7}


def _tensor_proto(name: str, arr: np.ndarray) -> bytes:
    out = b""
    for d in arr.shape:
        out += _pb_int(1, d)  # dims
    out += _pb_int(2, _CODES[arr.dtype])  # data_type
    out += _pb_len(8, name.encode())  # name
    out += _pb_len(9, np.ascontiguousarray(arr).tobytes())  # raw_data
    return out


def _onnx_bytes(tensors) -> bytes:
    graph = b"".join(_pb_len(5, _tensor_proto(n, a)) for n, a in tensors.items())
    graph += _pb_len(1, b"\x0a\x00")  # a dummy node field, must be skipped
    model = _pb_int(8, 18)  # ir_version-ish varint field, skipped
    model += _pb_len(7, graph)
    return model


def test_onnx_reader_roundtrip():
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.normal(size=(4, 3, 3, 3)).astype(np.float32),
        "b.bias": rng.normal(size=(7,)).astype(np.float16),
        "c.shape": np.asarray([1, 2, 3], np.int64),
    }
    got = read_onnx_initializers(_onnx_bytes(tensors))
    assert set(got) == set(tensors)
    np.testing.assert_array_equal(got["a.weight"], tensors["a.weight"])
    # fp16 upcast to fp32 on read
    assert got["b.bias"].dtype == np.float32
    np.testing.assert_allclose(got["b.bias"], tensors["b.bias"].astype(np.float32))
    np.testing.assert_array_equal(got["c.shape"], tensors["c.shape"])


def test_onnx_unfused_detector_forward_parity(tmp_path):
    tm = _torch_model()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    path = tmp_path / "det.onnx"
    path.write_bytes(_onnx_bytes(sd))

    variables = convert_detector_onnx(str(path), TINY.depths)
    fm = YoloLitePi(TINY)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = fm.apply(variables, x, train=False)
    with torch.no_grad():
        reg_t, cls_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out["reg"]), reg_t.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["cls"]), cls_t.numpy(), atol=2e-4, rtol=1e-3
    )


def _fuse(sd):
    """Numpy Conv+BN fusion (what Ultralytics' fuse() does before export)."""
    out = {}
    for k, v in sd.items():
        if ".bn." in k or k.endswith("num_batches_tracked"):
            continue
        out[k] = v.copy()
    for k in list(sd):
        if not k.endswith(".conv.weight"):
            continue
        base = k[: -len(".conv.weight")]
        if f"{base}.bn.weight" not in sd:
            continue
        g = sd[f"{base}.bn.weight"]
        b = sd[f"{base}.bn.bias"]
        mean = sd[f"{base}.bn.running_mean"]
        var = sd[f"{base}.bn.running_var"]
        scale = g / np.sqrt(var + 1e-3)
        out[k] = sd[k] * scale[:, None, None, None]
        out[f"{base}.conv.bias"] = b - mean * scale
    return out


def test_onnx_fused_detector_forward_parity(tmp_path):
    """Fused export (conv carries bias, no bn — the shipped reference
    artifacts' layout) must decode through the identity-BN defusion."""
    tm = _torch_model()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    fused = _fuse(sd)
    assert not any(".bn." in k for k in fused)
    path = tmp_path / "det_fused.onnx"
    path.write_bytes(_onnx_bytes(fused))

    variables = convert_detector_onnx(str(path), TINY.depths)
    fm = YoloLitePi(TINY)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = fm.apply(variables, x, train=False)
    with torch.no_grad():
        reg_t, cls_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out["cls"]), cls_t.numpy(), atol=1e-3, rtol=1e-3
    )


def test_onnx_classifier_forward_parity(tmp_path):
    """Name-preserving classifier ONNX export -> converter -> Flax forward
    matches the torch source (reference exports its classifiers torch->ONNX
    before engine conversion — convert-model-classify.ipynb cells 3-12)."""
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx
    from tests.torch_refs import ShuffleNetV2T

    torch.manual_seed(0)
    tm = ShuffleNetV2T(num_classes=7)
    randomize_bn_stats(tm, seed=1)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    path = tmp_path / "cls.onnx"
    path.write_bytes(_onnx_bytes(sd))

    variables = convert_classifier_onnx("shufflenetv2", str(path))
    fm = build_classifier("shufflenetv2", 7)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(fm.apply(variables, x, train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_onnx_classifier_folded_export_rejected_with_guidance():
    """Constant-folded exports rename initializers; the converter must fail
    loudly with re-export guidance rather than produce garbage weights."""
    from litepi_tpu.weights.onnx_import import convert_classifier_onnx

    folded = {"onnx::Conv_123": np.ones((24, 3, 3, 3), np.float32)}
    with pytest.raises(ValueError, match="do_constant_folding"):
        convert_classifier_onnx("shufflenetv2", folded)


def test_convert_cli_classifier_onnx(tmp_path):
    """The convert CLI routes classifier .onnx inputs end-to-end."""
    from litepi_tpu.apps.convert import main
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.checkpoint import load_checkpoint
    from tests.torch_refs import ShuffleNetV2T

    torch.manual_seed(0)
    tm = ShuffleNetV2T(num_classes=7)
    randomize_bn_stats(tm, seed=1)
    tm.eval()
    onnx = tmp_path / "cls.onnx"
    onnx.write_bytes(_onnx_bytes({k: v.numpy() for k, v in tm.state_dict().items()}))

    out = str(tmp_path / "ckpt_cls_onnx")
    assert main(
        ["--arch", "shufflenetv2", "--num_classes", "7",
         "--input", str(onnx), "--output", out]
    ) == 0
    fm = build_classifier("shufflenetv2", 7)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(fm.apply(load_checkpoint(out), x, train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_defuse_leaves_unfused_alone():
    sd = {
        "x.conv.weight": np.ones((4, 3, 1, 1), np.float32),
        "x.bn.weight": np.ones(4, np.float32),
        "x.bn.bias": np.zeros(4, np.float32),
        "x.bn.running_mean": np.zeros(4, np.float32),
        "x.bn.running_var": np.ones(4, np.float32),
    }
    assert defuse_state_dict(sd) == sd


def test_convert_cli_detector_pt_and_onnx(tmp_path):
    """The convert CLI accepts a .pt container and a .onnx and produces
    parity-checked orbax checkpoints (VERDICT item 6 / SURVEY §7 step 2).
    TINY's channels equal yolo_plus_v1's, so that arch config applies."""
    from litepi_tpu.apps.convert import main
    from litepi_tpu.weights.checkpoint import load_checkpoint

    tm = _torch_model()
    pt = str(tmp_path / "best.pt")
    _save_ultralytics_like_container(_torch_model(), pt)
    onnx = tmp_path / "det.onnx"
    onnx.write_bytes(
        _onnx_bytes({k: v.numpy() for k, v in tm.state_dict().items()})
    )

    out_pt = str(tmp_path / "ckpt_pt")
    assert main(
        ["--arch", "yolo_plus_v1", "--num_classes", "1",
         "--input", pt, "--output", out_pt]
    ) == 0
    out_onnx = str(tmp_path / "ckpt_onnx")
    assert main(
        ["--arch", "yolo_plus_v1", "--num_classes", "1",
         "--input", str(onnx), "--output", out_onnx]
    ) == 0

    fm = YoloLitePi(TINY)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    a = fm.apply(load_checkpoint(out_pt), x, train=False)
    b = fm.apply(load_checkpoint(out_onnx), x, train=False)
    # both routes land on the same weights (fp16 container vs fp32 onnx)
    np.testing.assert_allclose(
        np.asarray(a["cls"]), np.asarray(b["cls"]), atol=3e-2, rtol=3e-2
    )


def test_lenient_unpickler_refuses_arbitrary_callables(tmp_path):
    """A crafted 'weights' pickle must NOT execute importable callables —
    neither the obvious ones (os.system) nor exec gadgets hiding inside
    otherwise-trusted packages (numpy.testing._private.utils.runstring
    exec()s its argument).  The lenient loader resolves only an
    exact-symbol allowlist; everything else becomes an inert stub."""
    import pickle

    from litepi_tpu.weights.torch_import import load_ultralytics_container

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, (f"touch {marker}",))

    class EvilNumpyGadget:
        def __reduce__(self):
            from numpy.testing._private.utils import runstring

            return (
                runstring,
                (f"import os; os.system('touch {marker}')", {}),
            )

    for payload in (Evil(), EvilNumpyGadget()):
        path = tmp_path / "evil.pt"
        with open(path, "wb") as f:
            pickle.dump({"model": payload}, f)
        try:
            load_ultralytics_container(str(path))
        except Exception:
            pass  # refusing loudly is fine; executing is not
        assert not marker.exists(), "malicious pickle payload was executed"


def test_train_checkpoint_swap_survives_partial_rename(tmp_path):
    """Preemption between the resume-swap renames must leave a restorable
    checkpoint (the .old fallback)."""
    import os

    import jax.numpy as jnp

    from litepi_tpu.weights.checkpoint import (
        load_train_checkpoint,
        save_train_checkpoint,
    )

    state = {"w": jnp.arange(4.0)}
    path = str(tmp_path / "resume")
    save_train_checkpoint(path, state, {"next_epoch": 3, "best_score": 0.5,
                                        "best_epoch": 1})
    # simulate a crash after `rename path -> path.old` but before the new
    # checkpoint took its place
    os.rename(path, path + ".old")
    restored, meta = load_train_checkpoint(
        path, state,
        meta_template={"next_epoch": 0, "best_score": 0.0, "best_epoch": 0},
    )
    assert meta["next_epoch"] == 3 and float(restored["w"][3]) == 3.0


def test_classifier_onnx_fused_predicate_matrix(tmp_path):
    """The fused-vs-unfused routing matrix that the 03eb66e regression
    broke: the fused ingester must CLAIM deploy-form graphs (biased convs,
    no BN stats) and REJECT training-form graphs (bias-free convs, BN
    stats present) so callers fall through to the name-preserving
    converter (reference contract: convert-model-classify.ipynb cells 3-4
    exports both forms)."""
    from litepi_tpu.weights.onnx_import import (
        convert_classifier_onnx,
        convert_classifier_onnx_fused,
    )
    from tests.torch_refs import ShuffleNetV2T

    torch.manual_seed(2)
    tm = ShuffleNetV2T(num_classes=5)
    randomize_bn_stats(tm, seed=3)
    tm.eval()
    unfused_sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    # unfused graph: fused ingester rejects with the BN/bias diagnosis ...
    with pytest.raises(ValueError, match="fused ShuffleNetV2"):
        convert_classifier_onnx_fused(_onnx_bytes(unfused_sd))
    # ... and the name-preserving converter accepts it
    variables = convert_classifier_onnx("shufflenetv2", _onnx_bytes(unfused_sd))
    assert "params" in variables

    # fused graph (our own emission): fused ingester accepts
    from litepi_tpu.models import build_classifier
    from litepi_tpu.weights.ncnn_export import shufflenetv2_fused_state_dict
    from litepi_tpu.weights.onnx_export import build_classifier_onnx
    from litepi_tpu.models.registry import CLASSIFIER_BN_EPS
    from litepi_tpu.weights.fold_bn import fold_pipeline_vars

    folded, fused_flag = fold_pipeline_vars(variables, eps=CLASSIFIER_BN_EPS)
    assert fused_flag
    fused_sd = shufflenetv2_fused_state_dict(folded)
    data = build_classifier_onnx("shufflenetv2", fused_sd, 5)
    fused_vars, ncls = convert_classifier_onnx_fused(data)
    assert ncls == 5

    # semantics match across the matrix
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    m_train = build_classifier("shufflenetv2", 5)
    m_fused = build_classifier("shufflenetv2", 5, fused=True)
    o1 = np.asarray(m_train.apply(variables, x, train=False))
    o2 = np.asarray(m_fused.apply(fused_vars, x, train=False))
    np.testing.assert_allclose(o2, o1, atol=1e-4, rtol=1e-4)
