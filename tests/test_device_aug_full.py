"""Default-hyp device augmentation on segment/pose (finite-loss smoke) and
the segment+mixup host fallback. Own file: each tiny train leaves jit caches
behind and the 1-CPU box caps out around five trains per pytest process.
"""

import csv
import random

import numpy as np

from make_dataset import make_dataset  # noqa: F401  (path side effects)


def _train_full(tmp_path, model_yaml, data_yaml, name, mixup=0.0):
    from drone_yolo_tpu import YOLO

    random.seed(0)
    np.random.seed(0)
    mdl = YOLO(model_yaml)
    mdl.train(
        data=str(data_yaml), epochs=2, imgsz=64, batch=8, workers=1,
        project=str(tmp_path), name=name, val=False, plots=False, verbose=False,
        warmup_epochs=0.0, seed=0, device_aug=True, close_mosaic=0, mixup=mixup,
        mosaic=1.0, scale=0.5, translate=0.1, fliplr=0.5, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
        copy_paste=0.0, flipud=0.0, degrees=0.0, shear=0.0, perspective=0.0,
        erasing=0.0, bgr=0.0, multi_scale=False, amp=False, nbs=8,
    )
    rows = list(csv.DictReader(open(tmp_path / name / "results.csv")))
    tot = [sum(float(v) for kk, v in r.items() if kk.startswith("train/")) for r in rows]
    assert len(tot) == 2 and all(np.isfinite(x) for x in tot)
    return mdl


def test_segment_device_aug_default_hyps_finite(tmp_path):
    import make_dataset as md

    seg_yaml = md.make_seg_dataset(tmp_path / "ds", n_train=8, n_val=4, size=96, nc=4, seed=7)
    mdl = _train_full(tmp_path, "yolov8n-seg.yaml", seg_yaml, "seg")
    assert mdl.trainer.device_aug


def test_pose_device_aug_mixup_default_hyps_finite(tmp_path):
    import make_dataset as md

    pose_yaml = md.make_pose_dataset(tmp_path / "dp", n_train=8, n_val=4, size=96, nc=2, seed=8, nkpt=4)
    mdl = _train_full(tmp_path, "yolov8n-pose.yaml", pose_yaml, "pose", mixup=0.5)
    assert mdl.trainer.device_aug


def test_segment_mixup_falls_back_to_host(tmp_path):
    """segment+mixup: documented host fallback (overlap-ID masks cannot hold
    instances of two blended images). Setup-only — no training step runs."""
    import make_dataset as md

    from drone_yolo_tpu.models.yolo.segment import SegmentationTrainer

    seg_yaml = md.make_seg_dataset(tmp_path / "ds", n_train=8, n_val=4, size=96, nc=4, seed=7)
    tr = SegmentationTrainer(overrides=dict(
        model="yolov8n-seg.yaml", data=str(seg_yaml), epochs=1, imgsz=64, batch=8,
        workers=1, project=str(tmp_path), name="segmix", val=False, plots=False,
        verbose=False, device_aug=True, mixup=0.5, task="segment", mode="train",
    ))
    tr._setup_train()
    assert not tr.device_aug
