"""YOLO-World training (VERDICT item 6): multimodal text sampling, grounding
dataset, and WorldTrainer end-to-end learning on synthetic data.
"""

import json

import numpy as np
import pytest

from make_dataset import make_dataset, make_image_with_boxes

from drone_yolo_tpu.data.world import GroundingDataset, RandomLoadTextT, WorldDataset, YOLOConcatDataset


def test_random_load_text_remaps_cls():
    rng = np.random.default_rng(0)
    labels = {
        "cls": np.array([2.0, 0.0, 2.0]),
        "bboxes": rng.random((3, 4)).astype(np.float32),
        "texts": [["a"], ["b"], ["c", "see"], ["d"]],
    }
    t = RandomLoadTextT(max_samples=4, padding=True, neg_samples=(4, 4))
    out = t(dict(labels))
    assert len(out["texts"]) == 4
    # every box kept, cls remapped into the sampled list consistently
    assert len(out["cls"]) == 3
    for orig, new in zip([2, 0, 2], out["cls"].astype(int)):
        assert out["texts"][new] in (labels["texts"][orig][0], labels["texts"][orig][-1]) or out["texts"][new] in labels["texts"][orig]


def test_world_dataset_batch(tmp_path):
    yaml_path = make_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=4, seed=3)
    from drone_yolo_tpu.cfg import get_cfg
    from drone_yolo_tpu.data.utils import check_det_dataset

    data = check_det_dataset(str(yaml_path))
    cfg = get_cfg(overrides={"imgsz": 64, "mosaic": 1.0, "task": "detect", "mode": "train"})
    ds = WorldDataset(
        img_path=data["train"], imgsz=64, augment=True, hyp=cfg, batch_size=4,
        data=data, max_text_samples=4, prefix="t: ",
    )
    batch = ds.collate([ds[i] for i in range(4)])
    assert len(batch["texts"]) == 4
    assert all(len(t) == 4 for t in batch["texts"])  # padded to max_samples
    assert batch["cls"].max() < 4


def test_grounding_dataset(tmp_path):
    import cv2

    root = tmp_path / "g"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        img, _ = make_image_with_boxes(rng, size=96)
        cv2.imwrite(str(root / "imgs" / f"{i}.jpg"), img[:, :, ::-1])
        images.append({"id": i, "height": 96, "width": 96, "file_name": f"{i}.jpg", "caption": "a red box and a blue box"})
        annotations.append({"image_id": i, "bbox": [10, 10, 30, 30], "iscrowd": 0, "tokens_positive": [[0, 9]]})
        annotations.append({"image_id": i, "bbox": [50, 50, 30, 30], "iscrowd": 0, "tokens_positive": [[14, 24]]})
    jf = root / "anno.json"
    jf.write_text(json.dumps({"images": images, "annotations": annotations}))

    from drone_yolo_tpu.cfg import get_cfg

    cfg = get_cfg(overrides={"imgsz": 64, "mosaic": 0.0, "task": "detect", "mode": "train"})
    ds = GroundingDataset(img_path=str(root / "imgs"), json_file=str(jf), imgsz=64, augment=True, hyp=cfg, batch_size=2, max_text_samples=4)
    assert len(ds) == 3
    s = ds.get_sample(0)
    assert s["texts"] == [["a red box"], ["a blue box"]]
    batch = ds.collate([ds[0], ds[1]])
    assert batch["mask"].sum() == 4  # two boxes per image survive

    concat = YOLOConcatDataset([ds, ds])
    assert len(concat) == 6
    assert concat[4]["img"].shape == concat[1]["img"].shape


@pytest.mark.slow
def test_world_trainer_learns(tmp_path):
    """World model trains on synthetic data and box mAP rises (VERDICT #6)."""
    import csv

    yaml_path = make_dataset(tmp_path / "d", n_train=32, n_val=8, size=96, nc=4, seed=5)
    from drone_yolo_tpu.models.world import YOLOWorld
    from drone_yolo_tpu.models.yolo.world import WorldTrainer

    m = YOLOWorld("yolov8n-worldv2.yaml")
    # the contrastive head needs a few hundred SGD steps from scratch (the
    # 500-step overfit probe reaches conf 0.89 with correct classes)
    m.train(
        trainer=WorldTrainer,
        data=str(yaml_path),
        epochs=40,
        imgsz=64,
        batch=8,
        nbs=8,  # accumulate=1: an optimizer step every batch
        optimizer="SGD",
        lr0=0.01,
        workers=1,
        project=str(tmp_path),
        name="world",
        val=True,
        plots=False,
        verbose=False,
        warmup_epochs=1.0,
        patience=60,
        mosaic=0.0,
        fliplr=0.0,
        scale=0.2,
    )
    rows = list(csv.DictReader(open(tmp_path / "world" / "results.csv")))
    assert len(rows) >= 6
    first_loss = float(rows[0]["train/box_loss"]) + float(rows[0]["train/cls_loss"])
    last_loss = float(rows[-1]["train/box_loss"]) + float(rows[-1]["train/cls_loss"])
    assert last_loss < first_loss, (first_loss, last_loss)
    map50 = [float(r["metrics/mAP50(B)"]) for r in rows]
    assert max(map50) > max(0.05, map50[0]), map50
