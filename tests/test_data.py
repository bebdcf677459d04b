"""Datasets + augmentation: geometry invariants and batch contracts."""

import numpy as np
import pytest

from litepi_tpu.data.augment import (
    cutmix_batch,
    hsv_augment,
    mix_collate,
    mixup_batch,
    mosaic4,
    random_flip_lr,
    random_scale_shift,
)
from litepi_tpu.data.dataset import (
    CropClassificationDataset,
    DetectionDataset,
    Prefetcher,
    list_pairs,
)


def _img(rng, h=100, w=160):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_flip_remaps_boxes():
    rng = np.random.default_rng(0)
    img = _img(rng)
    boxes = np.array([[10, 20, 50, 60]], np.float32)
    out_img, out_boxes = random_flip_lr(img, boxes, rng, p=1.0)
    np.testing.assert_allclose(out_boxes, [[160 - 50, 20, 160 - 10, 60]])
    np.testing.assert_array_equal(out_img[:, ::-1], img)


def test_scale_shift_keeps_boxes_inside():
    rng = np.random.default_rng(1)
    img = _img(rng)
    boxes = np.array([[0, 0, 160, 100]], np.float32)
    for _ in range(5):
        _, out = random_scale_shift(img, boxes, rng, 0.5, 320)
        assert (out >= 0).all() and (out <= 320).all()


def test_mosaic_combines_four():
    rng = np.random.default_rng(2)
    samples = [
        (_img(rng), np.array([[10, 10, 60, 60]], np.float32), np.array([i], np.int32))
        for i in range(4)
    ]
    canvas, boxes, cls = mosaic4(samples, rng, 320)
    assert canvas.shape == (320, 320, 3)
    assert boxes.shape[1] == 4 and len(boxes) == len(cls)
    assert (boxes >= 0).all() and (boxes <= 320).all()


def test_hsv_preserves_shape_dtype():
    rng = np.random.default_rng(3)
    img = _img(rng)
    out = hsv_augment(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_mixup_preserves_label_mass():
    rng = np.random.default_rng(4)
    imgs = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    onehot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)]
    _, soft = mixup_batch(imgs, onehot, rng)
    np.testing.assert_allclose(soft.sum(-1), 1.0, atol=1e-5)


def test_cutmix_preserves_label_mass():
    rng = np.random.default_rng(5)
    imgs = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    onehot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)]
    _, soft = cutmix_batch(imgs, onehot, rng)
    np.testing.assert_allclose(soft.sum(-1), 1.0, atol=1e-5)


def test_copy_paste_adds_objects():
    from litepi_tpu.data.augment import copy_paste

    rng = np.random.default_rng(7)
    img = np.zeros((100, 160, 3), np.uint8)
    boxes = np.array([[5, 5, 20, 20]], np.float32)
    cls = np.array([0], np.int32)
    donor = np.full((100, 160, 3), 200, np.uint8)
    d_boxes = np.array([[30, 30, 60, 70]], np.float32)
    d_cls = np.array([2], np.int32)
    out_img, out_boxes, out_cls = copy_paste(
        img, boxes, cls, donor, d_boxes, d_cls, rng, p=1.0
    )
    assert len(out_boxes) == 2 and out_cls.tolist() == [0, 2]
    x1, y1, x2, y2 = (int(v) for v in out_boxes[1])
    assert (x2 - x1, y2 - y1) == (30, 40)  # donor region size preserved
    assert (out_img[y1:y2, x1:x2] == 200).all()  # pixels actually pasted
    assert (img == 0).all()  # original untouched (copy semantics)


def test_copy_paste_p_zero_is_identity():
    from litepi_tpu.data.augment import copy_paste

    rng = np.random.default_rng(8)
    img = np.zeros((50, 50, 3), np.uint8)
    boxes = np.zeros((0, 4), np.float32)
    cls = np.zeros(0, np.int32)
    out_img, out_boxes, _ = copy_paste(
        img, boxes, cls, img, np.array([[5, 5, 20, 20]], np.float32),
        np.array([1], np.int32), rng, p=0.0,
    )
    assert len(out_boxes) == 0
    np.testing.assert_array_equal(out_img, img)


def test_mix_collate_p_zero_is_plain_onehot():
    rng = np.random.default_rng(6)
    imgs = rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 1])
    out_imgs, soft = mix_collate(imgs, labels, 3, rng, p=0.0)
    np.testing.assert_array_equal(soft, np.eye(3, dtype=np.float32)[labels])
    np.testing.assert_array_equal(out_imgs, imgs)


@pytest.fixture()
def det_dataset(tmp_path):
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), _img(rng, 120, 200))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.25 0.25\n")
    return str(img_dir), str(lbl_dir)


def test_detection_dataset_batches(det_dataset):
    imgs, lbls = det_dataset
    ds = DetectionDataset(imgs, lbls, input_size=160, max_gt=8, seed=0)
    assert len(ds) == 6
    batch = next(iter(ds.batches(4, steps=1)))
    assert batch["images"].shape == (4, 160, 160, 3)
    assert batch["images"].max() <= 1.0
    assert batch["gt_boxes"].shape == (4, 8, 4)
    assert batch["gt_mask"].any()
    # masked slots are zero
    assert (batch["gt_boxes"][~batch["gt_mask"]] == 0).all()


def test_detection_dataset_no_augment_letterboxes(det_dataset):
    imgs, lbls = det_dataset
    ds = DetectionDataset(imgs, lbls, input_size=160, max_gt=4, augment=False)
    batch = next(iter(ds.batches(2, steps=1)))
    # one gt per image, correctly letterboxed into 160-space
    for b in range(2):
        assert batch["gt_mask"][b].sum() == 1
        box = batch["gt_boxes"][b, 0]
        assert (box >= 0).all() and (box <= 160).all()
        assert box[2] > box[0] and box[3] > box[1]


@pytest.fixture()
def crop_dataset(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for c in ["stop", "yield", "limit"]:
        d = tmp_path / c
        d.mkdir()
        for i in range(4):
            cv2.imwrite(str(d / f"{i}.png"), _img(rng, 40, 40))
    return str(tmp_path)


def test_crop_dataset(crop_dataset):
    ds = CropClassificationDataset(crop_dataset, input_size=32, augment=False)
    assert ds.num_classes == 3 and len(ds) == 12
    batch = next(iter(ds.batches(6, steps=1)))
    assert batch["images"].shape == (6, 32, 32, 3)
    assert batch["labels"].shape == (6, 3)
    assert set(batch["hard_labels"]) <= {0, 1, 2}


def test_prefetcher_yields_everything():
    items = [{"i": i} for i in range(5)]
    out = list(Prefetcher(iter(items)))
    assert out == items


def test_list_pairs_matches_stems(det_dataset):
    imgs, lbls = det_dataset
    pairs = list_pairs(imgs, lbls)
    assert len(pairs) == 6
    for ip, lp in pairs:
        assert ip.endswith(".jpg") and lp.endswith(".txt")


def test_dataset_audit(tmp_path):
    """Pairing + sanity audit (reference train notebooks' pre-run checks)."""
    import cv2

    img_dir = tmp_path / "img"
    lbl_dir = tmp_path / "lbl"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(
            str(img_dir / f"a{i}.jpg"),
            rng.integers(0, 255, (32, 32, 3), np.uint8),
        )
    (img_dir / "bad.jpg").write_bytes(b"not a jpeg")
    (lbl_dir / "a0.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    (lbl_dir / "a1.txt").write_text("1 0.5 0.5 0.2 0.2\nmal formed\n")
    (lbl_dir / "a2.txt").write_text("0 1.5 0.5 0.2 0.2\n")  # cx out of range
    (lbl_dir / "ghost.txt").write_text("0 0.5 0.5 0.1 0.1\n")  # no image

    from litepi_tpu.data.audit import audit_dataset, format_report

    rep = audit_dataset(str(img_dir), str(lbl_dir), num_classes=1)
    assert not rep["ok"]
    assert rep["num_negatives"] == 1  # bad.jpg has no label (allowed class)
    assert len(rep["orphan_labels"]) == 1
    assert len(rep["unreadable_images"]) == 1
    assert len(rep["malformed_lines"]) == 1
    assert len(rep["out_of_range_lines"]) == 1
    assert len(rep["bad_class_lines"]) == 1  # class 1 with num_classes=1
    assert rep["class_counts"] == {0: 2, 1: 1}
    txt = format_report(rep)
    assert "PROBLEMS FOUND" in txt and "ORPHAN LABELS" in txt

    from litepi_tpu.apps.data_audit import main as audit_main

    assert audit_main(["--images", str(img_dir), "--labels", str(lbl_dir)]) == 1

    # a clean dataset passes
    (img_dir / "bad.jpg").unlink()
    (lbl_dir / "ghost.txt").unlink()
    (lbl_dir / "a1.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    (lbl_dir / "a2.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    assert audit_main(["--images", str(img_dir), "--labels", str(lbl_dir)]) == 0
