"""StableHLO export: serialized programs round-trip with identical outputs
(the framework's analogue of the reference's export smoke tests)."""

import numpy as np

from litepi_tpu.models import build_classifier
from litepi_tpu.models.init_utils import fast_init
from litepi_tpu.weights.export import (
    export_classifier,
    export_detector,
    load_program,
)


def test_classifier_export_roundtrip():
    model = build_classifier("shufflenetv2", 7)
    variables = fast_init(model, seed=0, spatial=32)
    blob = export_classifier("shufflenetv2", variables, 7, input_size=32, batch=2)
    assert isinstance(blob, bytes) and len(blob) > 100_000  # weights baked in

    fn = load_program(blob)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(fn(x))
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_detector_export_roundtrip():
    from litepi_tpu.core.types import DetectorConfig
    from litepi_tpu.models import YoloLitePi

    cfg = DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=128
    )
    model = YoloLitePi(cfg)
    variables = fast_init(model, seed=0)
    blob = export_detector(model, variables, input_size=128)

    fn = load_program(blob)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    got = fn(x)
    want = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got["reg"]), np.asarray(want["reg"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["cls"]), np.asarray(want["cls"]), atol=1e-5
    )
