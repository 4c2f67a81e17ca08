"""Augmentation pipeline invariants: boxes stay valid through mosaic/affine/flip."""

import numpy as np
import pytest

from make_dataset import make_dataset
from drone_yolo_tpu.data.augment import LetterBoxT, RandomFlip, RandomPerspective, clip_sample
from drone_yolo_tpu.data.dataset import YOLODataset
from drone_yolo_tpu.utils import IterableSimpleNamespace


def _hyp(**kw):
    base = dict(
        mosaic=1.0, mixup=0.0, copy_paste=0.0, degrees=10.0, translate=0.1, scale=0.5,
        shear=2.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, flipud=0.5,
        fliplr=0.5, bgr=0.0, mask_ratio=4,
    )
    base.update(kw)
    return IterableSimpleNamespace(**base)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("augset")
    yaml_path = make_dataset(root, n_train=8, n_val=2, size=128, nc=3, seed=3)
    return YOLODataset(str(root / "images" / "train"), imgsz=96, augment=True, hyp=_hyp(), data={"nc": 3}, batch_size=4)


def test_augmented_samples_valid(dataset):
    import random

    random.seed(0)
    np.random.seed(0)
    for i in range(len(dataset)):
        s = dataset[i]
        img, boxes, cls = s["img"], s["bboxes"], s["cls"]
        assert img.shape == (96, 96, 3) and img.dtype == np.uint8
        assert len(boxes) == len(cls)
        if len(boxes):
            assert (boxes[:, 0] <= boxes[:, 2]).all() and (boxes[:, 1] <= boxes[:, 3]).all()
            assert boxes.min() >= -1e-3 and boxes.max() <= 96 + 1e-3


def test_flip_involution():
    rng = np.random.default_rng(0)
    img = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    boxes = np.array([[10, 12, 30, 40]], np.float32)
    s = {"img": img.copy(), "cls": np.array([0.0]), "bboxes": boxes.copy()}
    f = RandomFlip(p=1.0, direction="horizontal")
    s = f(f(s))  # double flip = identity
    np.testing.assert_allclose(s["bboxes"], boxes, atol=1e-5)
    np.testing.assert_array_equal(s["img"], img)


def test_letterbox_transform_updates_boxes():
    img = np.full((50, 100, 3), 100, np.uint8)
    boxes = np.array([[10, 10, 90, 40]], np.float32)
    s = {"img": img, "cls": np.array([0.0]), "bboxes": boxes.copy()}
    out = LetterBoxT((64, 64), scaleup=True)(s)
    assert out["img"].shape == (64, 64, 3)
    r, (dw, dh) = out["ratio_pad"]
    np.testing.assert_allclose(out["bboxes"][0], boxes[0] * r + [dw, dh, dw, dh], atol=0.5)


def test_max_labels_rounding(dataset):
    """GT-slot padding rounds to x32 (<=128) / x128 multiples, NOT pow2: at
    dense drone loads (520 needed slots) pow2 padded to 1024 and doubled every
    (B, M, A) assigner tensor (r5 OOM at b32/640px)."""
    from drone_yolo_tpu.data.dataset import round_label_slots

    assert round_label_slots(10, 1.25) == 32  # tiny datasets keep the floor
    assert round_label_slots(100, 1.25) == 128  # boundary stays sublane-sized
    assert round_label_slots(130, 4) == 640  # dense mosaic load: was 1024 pow2
    assert round_label_slots(500, 5) == 2048  # cap unchanged
    # the real dataset wires it: enough slots for every sample, x32-aligned
    n_max = max(len(lb["cls"]) for lb in dataset.labels)
    assert dataset.max_labels % 32 == 0 and dataset.max_labels >= n_max


def test_collate_padding(dataset):
    samples = [dataset[i] for i in range(4)]
    batch = dataset.collate(samples)
    b, m = batch["cls"].shape
    assert b == 4 and m == dataset.max_labels
    assert batch["mask"].sum() == sum(min(len(s["cls"]), m) for s in samples)
    # padded slots are zero
    for i, s in enumerate(samples):
        n = min(len(s["cls"]), m)
        assert (batch["bboxes"][i, n:] == 0).all()


def test_mosaic_buffer_cuts_decodes(tmp_path):
    """Mosaic companions come from the decoded-image buffer (reference
    base.py:176-180): one epoch of a mosaic dataset decodes each image ~once,
    not ~4x, and the buffer is capped at min(ni, 8*batch, 1000)."""
    import cv2

    yaml_path = make_dataset(tmp_path, n_train=12, n_val=2, size=128, nc=3, seed=5)
    ds = YOLODataset(str(tmp_path / "images" / "train"), imgsz=96, augment=True, hyp=_hyp(), data={"nc": 3}, batch_size=4)
    assert ds.max_buffer_length == 12  # min(ni=12, 8*4=32, 1000)

    real_imread = cv2.imread
    counter = {"n": 0}

    def counting_imread(path, *a, **kw):
        counter["n"] += 1
        return real_imread(path, *a, **kw)

    cv2.imread = counting_imread
    try:
        import random

        random.seed(0)
        for i in range(len(ds)):
            _ = ds[i]
    finally:
        cv2.imread = real_imread
    # every companion after warmup is a buffer hit: ~1 decode/sample, not 4
    assert counter["n"] <= len(ds) + 3, counter["n"]
    assert len(ds.buffer) <= ds.max_buffer_length
    # val path keeps no buffer
    ds_val = YOLODataset(str(tmp_path / "images" / "val"), imgsz=96, augment=False, data={"nc": 3}, batch_size=4)
    _ = ds_val[0]
    assert ds_val.max_buffer_length == 0 and not ds_val.buffer


def test_augmentation_deterministic_across_workers(tmp_path):
    """Per-sample seeded RNG + deterministic companion windows: an epoch's
    batches are bit-identical for workers=1 and workers=3 (stronger than the
    reference, whose results change with num_workers). Also identical across
    repeat runs, and different across epochs."""
    from drone_yolo_tpu.data.build import build_dataloader

    yaml_path = make_dataset(tmp_path, n_train=16, n_val=2, size=128, nc=3, seed=11)
    img_dir = str(tmp_path / "images" / "train")

    def epoch_batches(workers, epoch):
        ds = YOLODataset(img_dir, imgsz=96, augment=True, hyp=_hyp(), data={"nc": 3}, batch_size=4)
        loader = build_dataloader(ds, 4, workers, shuffle=True, seed=7)
        loader.set_epoch(epoch)
        return [b for b in loader]

    a = epoch_batches(1, 0)
    b = epoch_batches(3, 0)
    assert len(a) == len(b) == 4
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["img"], bb["img"])
        np.testing.assert_array_equal(ba["bboxes"], bb["bboxes"])
        np.testing.assert_array_equal(ba["cls"], bb["cls"])
    c = epoch_batches(3, 1)
    assert any((ba["img"] != bc["img"]).any() for ba, bc in zip(a, c))


def test_clip_sample_drops_empty():
    s = {
        "img": np.zeros((32, 32, 3), np.uint8),
        "cls": np.array([0.0, 1.0]),
        "bboxes": np.array([[5, 5, 20, 20], [32.0, 32.0, 40, 40]], np.float32),
    }
    out = clip_sample(s, (32, 32))
    assert len(out["bboxes"]) == 1 and out["cls"][0] == 0.0
