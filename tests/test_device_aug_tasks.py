"""Device augmentation on segment and pose tasks (data/device_aug.py).

Split from test_device_aug.py: each train spins up its own jit graphs and the
1-CPU box cannot hold all task trainers in one pytest process (the same RSS
ceiling tools/run_suite.py exists for).
"""

import csv
import random

import numpy as np

from make_dataset import make_dataset  # noqa: F401  (path side effects)

NO_AUG = dict(
    mosaic=0.0, mixup=0.0, copy_paste=0.0, fliplr=0.0, flipud=0.0, hsv_h=0.0,
    hsv_s=0.0, hsv_v=0.0, translate=0.0, scale=0.0, degrees=0.0, shear=0.0,
    perspective=0.0, erasing=0.0, bgr=0.0, multi_scale=False, amp=False,
    nbs=8,
)


def test_segment_zero_aug_device_matches_host(tmp_path):
    import make_dataset as md

    yaml_path = md.make_seg_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=4, seed=5)
    losses = {}
    for flag in (False, True):
        from drone_yolo_tpu import YOLO

        random.seed(0)
        np.random.seed(0)
        mdl = YOLO("yolov8n-seg.yaml")
        mdl.train(
            data=str(yaml_path), epochs=2, imgsz=64, batch=8, workers=1,
            project=str(tmp_path), name=f"seg{int(flag)}", val=False, plots=False, verbose=False,
            warmup_epochs=0.0, seed=0, device_aug=flag, **NO_AUG,
        )
        rows = list(csv.DictReader(open(tmp_path / f"seg{int(flag)}" / "results.csv")))
        losses[flag] = [sum(float(v) for kk, v in r.items() if kk.startswith("train/")) for r in rows]
        assert mdl.trainer.device_aug == flag
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4, atol=1e-4)


def test_pose_zero_aug_device_matches_host(tmp_path):
    import make_dataset as md

    yaml_path = md.make_pose_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=2, seed=6, nkpt=4)
    losses = {}
    for flag in (False, True):
        from drone_yolo_tpu import YOLO

        random.seed(0)
        np.random.seed(0)
        mdl = YOLO("yolov8n-pose.yaml")
        mdl.train(
            data=str(yaml_path), epochs=2, imgsz=64, batch=8, workers=1,
            project=str(tmp_path), name=f"pose{int(flag)}", val=False, plots=False, verbose=False,
            warmup_epochs=0.0, seed=0, device_aug=flag, **NO_AUG,
        )
        rows = list(csv.DictReader(open(tmp_path / f"pose{int(flag)}" / "results.csv")))
        losses[flag] = [sum(float(v) for kk, v in r.items() if kk.startswith("train/")) for r in rows]
        assert mdl.trainer.device_aug == flag
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4, atol=1e-4)
