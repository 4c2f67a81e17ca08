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
    """World model trains from scratch through WorldTrainer and reaches real
    box mAP (VERDICT #6). Recipe validated standalone: 150 full-batch SGD steps
    reach mAP50 ~0.75 (the contrastive head needs a few hundred steps from
    random init — reference world models always start pretrained)."""
    import cv2

    td = tmp_path
    colors = [(230, 40, 40), (40, 230, 40), (40, 40, 230), (230, 230, 40)]
    for split, n, seed in (("train", 16, 0), ("val", 8, 1)):
        (td / "images" / split).mkdir(parents=True)
        (td / "labels" / split).mkdir(parents=True)
        rng = np.random.default_rng(seed)
        for i in range(n):
            cls = i % 4
            img = np.full((64, 64, 3), 100, np.uint8)
            x1, y1 = int(rng.integers(4, 28)), int(rng.integers(4, 28))
            img[y1 : y1 + 32, x1 : x1 + 32] = colors[cls]
            cv2.imwrite(str(td / "images" / split / f"{i}.jpg"), img[:, :, ::-1])
            (td / "labels" / split / f"{i}.txt").write_text(
                f"{cls} {(x1 + 16) / 64} {(y1 + 16) / 64} 0.5 0.5\n"
            )
    (td / "data.yaml").write_text(
        f"path: {td}\ntrain: images/train\nval: images/val\nnames:\n  0: red\n  1: green\n  2: blue\n  3: yellow\n"
    )

    from drone_yolo_tpu.models.world import YOLOWorld
    from drone_yolo_tpu.models.yolo.world import WorldTrainer

    m = YOLOWorld("yolov8n-worldv2.yaml")
    m.train(
        trainer=WorldTrainer,
        data=str(td / "data.yaml"),
        epochs=150,
        imgsz=64,
        batch=16,
        nbs=16,
        optimizer="SGD",
        lr0=0.01,
        workers=1,
        project=str(td),
        name="world",
        val=False,  # validate once at the end (CPU budget)
        plots=False,
        verbose=False,
        warmup_epochs=0.0,
        patience=500,
        mosaic=0.0,
        fliplr=0.0,
        scale=0.0,
        translate=0.0,
        hsv_h=0.0,
        hsv_s=0.0,
        hsv_v=0.0,
        erasing=0.0,
    )
    res = m.val(data=str(td / "data.yaml"), imgsz=64, batch=8, workers=1, plots=False, verbose=False)
    assert res.box.map50 > 0.3, f"world mAP50={res.box.map50}"
    assert res.box.map > 0.15, f"world mAP50-95={res.box.map}"
