"""Detector weight-converter parity: Ultralytics-keyed torch mirror vs Flax.

The reference's own parity test pattern (pnnx model_ncnn.py: seeded input
through the converted graph vs the source model) applied to the detector
family — closing the 'weight conversion fidelity' item from SURVEY §7.
"""

import numpy as np
import torch

from litepi_tpu.core.types import DetectorConfig, YOLO_PLUS_V2
from litepi_tpu.models import YoloLitePi
from litepi_tpu.weights.torch_import import convert_detector_state_dict
from tests.torch_refs import randomize_bn_stats
from tests.torch_yolo_ref import YoloV8T


def _parity(cfg: DetectorConfig, size: int, atol: float = 2e-4) -> None:
    torch.manual_seed(0)
    tm = YoloV8T(
        cfg.channels, cfg.depths, nc=cfg.num_classes, reg_max=cfg.reg_max,
        neck_shortcut=cfg.neck_shortcut, neck_down=cfg.neck_down_channels,
    )
    randomize_bn_stats(tm, seed=1)
    tm.eval()

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        reg_t, cls_t = tm(torch.from_numpy(x).permute(0, 3, 1, 2))

    fm = YoloLitePi(cfg)
    variables = convert_detector_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg.depths
    )
    out = fm.apply(variables, x, train=False)

    np.testing.assert_allclose(
        np.asarray(out["reg"]), reg_t.numpy(), atol=atol, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["cls"]), cls_t.numpy(), atol=atol, rtol=1e-3
    )


def test_yolo_plus_v2_matches_ultralytics_keyed_torch():
    _parity(YOLO_PLUS_V2, size=128)


def test_yolo_plus_v1_matches_ultralytics_keyed_torch():
    """v1's PAN differs from v2 (wider down convs — core/types.py); its
    real-weight ingestion is further covered by tests/test_ncnn_import.py."""
    from litepi_tpu.core.types import YOLO_PLUS_V1

    _parity(YOLO_PLUS_V1, size=128)


def test_yolov8n_width_matches():
    """Stock v8n: wider channels AND the non-residual neck C2fs."""
    from litepi_tpu.core.types import YOLOV8N

    _parity(YOLOV8N, size=96)
