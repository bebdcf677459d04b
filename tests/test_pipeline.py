"""Fused two-stage pipeline: contract, masking and two-pass conf protocol."""

import numpy as np
import pytest

from litepi_tpu.core.types import (
    DetectorConfig,
    NMSConfig,
    PipelineConfig,
)
from litepi_tpu.pipeline import TwoStagePipeline

SMALL = PipelineConfig(
    detector=DetectorConfig(
        name="tiny", base_channels=(32, 64, 128, 256, 512), input_size=160
    ),
    nms=NMSConfig(max_candidates=128, max_detections=8, min_area=4.0),
    classifier_arch="shufflenetv2",
    num_classifier_classes=10,
    det_input_size=160,
    cls_input_size=64,
)


@pytest.fixture(scope="module")
def pipe():
    return TwoStagePipeline.initialize(SMALL, seed=0)


def test_fused_output_contract(pipe):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 200, 300, 3), dtype=np.uint8)
    out = pipe.run_fused(frames, conf_threshold=0.001)
    d = SMALL.nms.max_detections
    assert out["boxes"].shape == (2, d, 4)
    assert out["det_scores"].shape == (2, d)
    assert out["valid"].shape == (2, d)
    assert out["cls_probs"].shape == (2, d, 10)
    assert out["cls_labels"].shape == (2, d)
    for v in out.values():
        assert np.isfinite(np.asarray(v, dtype=np.float64)).all()
    # boxes must be inside the original frame
    b = np.asarray(out["boxes"])
    assert (b[..., [0, 2]] <= 300).all() and (b[..., [1, 3]] <= 200).all()
    assert (b >= 0).all()
    # classifier probabilities sum to 1
    np.testing.assert_allclose(
        np.asarray(out["cls_probs"]).sum(-1), 1.0, atol=1e-4
    )


def test_two_pass_conf_protocol(pipe):
    """Lower conf must never yield fewer detections, and the second pass must
    not recompile (traced threshold — the reference's benchmark_conf /
    yolo_conf two-pass, e2e.py:971-992)."""
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (1, 200, 300, 3), dtype=np.uint8)
    lo = pipe.run_fused(frames, conf_threshold=0.0001)
    n_compiles = pipe._fused_jit._cache_size()
    hi = pipe.run_fused(frames, conf_threshold=0.9)
    assert np.asarray(lo["valid"]).sum() >= np.asarray(hi["valid"]).sum()
    # the second pass must reuse the first pass's compiled program
    assert pipe._fused_jit._cache_size() == n_compiles


def test_staged_detect_classify(pipe):
    """The staged path (reference HybridPipeline structure) runs standalone."""
    rng = np.random.default_rng(2)
    canvas01 = rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32)
    det = pipe.detect(canvas01, conf_threshold=0.001)
    assert det["boxes"].shape == (2, 8, 4)
    crops01 = rng.uniform(0, 1, (5, 64, 64, 3)).astype(np.float32)
    probs = np.asarray(pipe.classify(crops01))
    assert probs.shape == (5, 10)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_invalid_slots_have_sentinel_class(pipe):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (1, 200, 300, 3), dtype=np.uint8)
    out = pipe.run_fused(frames, conf_threshold=0.999999)
    assert np.asarray(out["valid"]).sum() == 0
    assert (np.asarray(out["det_class_ids"]) == -1).all()


def test_crop_det_budget(pipe):
    """Per-frame crop budget (PipelineConfig.crop_det_budget): outputs carry
    the top ``budget`` score-descending slots per frame, bit-equal to the
    same slots of the unbudgeted program (nms_sorted orders slots by score,
    so the budget is a static slice taken before unmap/area/crop/classify).

    TPU rationale: the dense ROI crop pays one hat-matmul against the full
    frame per slot; slicing at the NMS boundary shrinks the crop stage by
    max_detections/budget (measured on-chip; see PARITY perf notes)."""
    import dataclasses

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 200, 300, 3), dtype=np.uint8)
    base = pipe.run_fused(frames, conf_threshold=0.01)
    d2 = np.asarray(base["valid"]).shape[1] // 2

    cfg = dataclasses.replace(SMALL, crop_det_budget=d2)
    p = TwoStagePipeline(cfg, pipe.det_vars, pipe.cls_vars)
    capped = p.run_fused(frames, conf_threshold=0.01)

    assert np.asarray(capped["valid"]).shape[1] == d2
    for k in base:
        a, b = np.asarray(base[k])[:, :d2], np.asarray(capped[k])
        assert np.array_equal(a, b), k
    # the fixture must actually exercise a non-trivial slice
    assert np.asarray(base["valid"]).sum() >= 1


def test_cls_crop_budget(pipe):
    """Global classifier compaction (PipelineConfig.cls_crop_budget): with
    the budget covering every valid detection the fused outputs are
    bit-identical to the unbudgeted program; with a smaller budget exactly
    the top-scoring detections keep their slots, bit-equal on survivors.

    TPU rationale: the per-frame NMS budget sizes for the densest frame,
    but at serving conf the mean occupancy is far lower — compacting crops
    across the batch before the classifier skips the masked padding
    (measured on-chip; see PARITY perf notes)."""
    import dataclasses

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, 200, 300, 3), dtype=np.uint8)
    base = pipe.run_fused(frames, conf_threshold=0.01)
    v0 = np.asarray(base["valid"])
    n_valid = int(v0.sum())
    assert n_valid >= 3, "fixture must produce detections for this test"

    def with_budget(r):
        cfg = dataclasses.replace(SMALL, cls_crop_budget=r)
        p = TwoStagePipeline(cfg, pipe.det_vars, pipe.cls_vars)
        return p.run_fused(frames, conf_threshold=0.01)

    # budget >= valid count: everything identical
    ample = with_budget(v0.size - 1)  # < n*d so the compaction path runs
    if n_valid <= v0.size - 1:
        for k in base:
            a, b = np.asarray(base[k])[v0], np.asarray(ample[k])[v0]
            assert np.array_equal(a, b), k
        assert np.array_equal(v0, np.asarray(ample["valid"]))

    # budget below the valid count: top-scoring detections survive,
    # bit-equal to the unbudgeted run on surviving slots
    r = n_valid - 2
    capped = with_budget(r)
    v1 = np.asarray(capped["valid"])
    assert int(v1.sum()) == r
    scores = np.asarray(base["det_scores"])
    kept, dropped = scores[v1], scores[v0 & ~v1]
    assert kept.min() >= dropped.max()
    for k in ("boxes", "det_scores", "cls_probs", "cls_labels"):
        assert np.array_equal(np.asarray(base[k])[v1], np.asarray(capped[k])[v1]), k


def test_approx_candidate_selector(pipe):
    """candidate_selector="approx" (PipelineConfig): a serving knob swapping
    the exact sort-based top_k for TPU approx_max_k.  Contract: scores come
    back DESCENDING (nms_sorted requires it), and on peaked score maps —
    clear detections over a flat background, the serving regime — the
    conf-clearing survivors match the exact program's.  The all-tied
    background tail may differ; that is the documented trade."""
    import dataclasses

    rng = np.random.default_rng(11)
    # peaked scene: bright blocks on a dark field (clear score separation)
    frames = (rng.uniform(0, 0.25, (2, 200, 300, 3)) * 255).astype(np.uint8)
    for i in range(2):
        for k in range(3):
            x, y = 40 + 80 * k, 50 + 40 * i
            frames[i, y : y + 40, x : x + 40] = 255

    cfg = dataclasses.replace(SMALL, candidate_selector="approx")
    p_apx = TwoStagePipeline(cfg, pipe.det_vars, pipe.cls_vars)
    apx = p_apx.run_fused(frames, conf_threshold=0.05)
    s_apx = np.asarray(apx["det_scores"])
    v_apx = np.asarray(apx["valid"])
    # descending-score slot contract holds through NMS
    for b in range(2):
        vs = s_apx[b][v_apx[b]]
        assert (np.diff(vs) <= 1e-6).all()

    base = pipe.run_fused(frames, conf_threshold=0.05)
    v_b = np.asarray(base["valid"])
    # the random-init detector's peaked responses that clear conf survive
    # under BOTH selectors with identical geometry (order may tie-shuffle,
    # so compare as canonically sorted sets)
    def canon(out, v):
        bx = np.asarray(out["boxes"])[v]
        return bx[np.lexsort(bx.T[::-1])]

    assert v_apx.sum() == v_b.sum()
    np.testing.assert_allclose(canon(apx, v_apx), canon(base, v_b), atol=1e-3)


def test_unknown_candidate_selector_rejected(pipe):
    import dataclasses

    from litepi_tpu.ops.dfl import decode_candidates  # noqa: F401

    cfg = dataclasses.replace(SMALL, candidate_selector="typo")
    p = TwoStagePipeline(cfg, pipe.det_vars, pipe.cls_vars)
    with pytest.raises(ValueError, match="unknown candidate selector"):
        p.run_fused(np.zeros((1, 160, 160, 3), np.uint8), 0.25)
