"""Accuracy-level device_aug validation (VERDICT r4 weak #5 / next #6).

For each supported task (detect / segment / pose), train the SAME model twice
with full default-strength augmentation — once with the host pipeline
(data/augment.py) and once with device_aug=True (data/device_aug.py, the
in-graph mosaic/affine/HSV/flip path) — and compare final val metrics. The
kernel-level parity tests (tests/test_device_aug*.py) prove the zero-aug path
bit-matches and the warp kernels match cv2; this tool supplies the missing
claim: a model TRAINED under device augmentation reaches host-augmentation
val metrics (within run-to-run noise).

Reference bar: the torch pipeline these augmentations re-implement is
ultralytics/data/augment.py:188-1301 (Mosaic/RandomPerspective/RandomHSV/
RandomFlip/MixUp).

Run (TPU or CPU): python tools/device_aug_accuracy.py [detect segment pose]
Env: DAA_EPOCHS=40 DAA_WORK=/tmp/device_aug_acc DAA_SEEDS=0,1
Writes WORK/device_aug_accuracy.json — one row per (task, pipeline, seed).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

WORK = Path(os.environ.get("DAA_WORK", "/tmp/device_aug_acc"))
EPOCHS = int(os.environ.get("DAA_EPOCHS", 40))
SEEDS = tuple(int(s) for s in os.environ.get("DAA_SEEDS", "0").split(","))

# full-strength default aug so the augmented device paths are the thing under
# test (mosaic on until close_mosaic, affine scale/translate, HSV, flip)
COMMON = dict(
    epochs=EPOCHS,
    optimizer="SGD",
    lr0=0.01,
    lrf=0.01,
    nbs=None,  # set per-task batch below; nbs==batch -> accumulate=1
    mosaic=float(os.environ.get("DAA_MOSAIC", 1.0)),  # 0 isolates affine/HSV/flip
    close_mosaic=max(2, EPOCHS // 4),
    scale=0.5,
    translate=0.1,
    fliplr=0.5,
    hsv_h=0.015,
    hsv_s=0.7,
    hsv_v=0.4,
    mixup=0.0,
    copy_paste=0.0,
    degrees=0.0,
    shear=0.0,
    perspective=0.0,
    rect=False,
    multi_scale=False,
    val=False,
    plots=False,
    patience=10_000,
    deterministic=True,
    cache="ram",
    workers=2,
    amp=True,
)

METRIC = {
    "detect": ("metrics/mAP50-95(B)", "metrics/mAP50(B)"),
    "segment": ("metrics/mAP50-95(M)", "metrics/mAP50(M)"),
    "pose": ("metrics/mAP50-95(P)", "metrics/mAP50(P)"),
}


def _dataset(task: str) -> tuple[str, str, int, int]:
    """Build (data_yaml, model_yaml, imgsz, batch) for a task."""
    if task == "detect":
        from dense_dataset import make_dense_dataset

        root = WORK / "ds_detect"
        yaml_path = root / "data.yaml"
        if not yaml_path.exists():
            yaml_path = make_dense_dataset(root, n_train=160, n_val=96, size=320, seed=7, nc=6)
        return str(yaml_path), "yolov8n.yaml", 320, 16
    if task == "segment":
        from make_dataset import make_seg_dataset

        root = WORK / "ds_segment"
        if not (root / "data.yaml").exists():
            make_seg_dataset(root, n_train=128, n_val=64, size=256, nc=4, seed=3)
        return str(root / "data.yaml"), "yolov8n-seg.yaml", 256, 16
    if task == "pose":
        from make_dataset import make_pose_dataset

        root = WORK / "ds_pose"
        if not (root / "data.yaml").exists():
            make_pose_dataset(root, n_train=128, n_val=64, size=256, nc=2, nkpt=4, seed=3)
        return str(root / "data.yaml"), "yolov8n-pose.yaml", 256, 16
    raise ValueError(task)


def run_one(task: str, device_aug: bool, seed: int) -> dict:
    from drone_yolo_tpu.engine.model import YOLO

    data, model_yaml, imgsz, batch = _dataset(task)
    name = f"{task}_{'dev' if device_aug else 'host'}_s{seed}"
    hyps = dict(COMMON, imgsz=imgsz, batch=batch, nbs=batch, seed=seed, device_aug=device_aug)
    t0 = time.time()
    facade = YOLO(model_yaml, task=task)
    facade.train(data=data, project=str(WORK / "runs"), name=name, exist_ok=True, save=True, **hyps)
    res = facade.val(data=data, imgsz=imgsz, batch=batch, rect=False, conf=0.001, iou=0.7, max_det=300, plots=False, verbose=False)
    rd = res.results_dict
    k95, k50 = METRIC[task]
    row = {
        "task": task,
        "pipeline": "device_aug" if device_aug else "host_aug",
        "seed": seed,
        "map50_95": round(float(rd[k95]), 4),
        "map50": round(float(rd[k50]), 4),
        "train_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main(tasks):
    WORK.mkdir(parents=True, exist_ok=True)
    out_path = WORK / "device_aug_accuracy.json"
    rows = json.loads(out_path.read_text())["rows"] if out_path.exists() else []
    done = {(r["task"], r["pipeline"], r["seed"]) for r in rows}
    for task in tasks:
        for seed in SEEDS:
            for device_aug in (False, True):
                key = (task, "device_aug" if device_aug else "host_aug", seed)
                if key in done:
                    print("skip (cached):", key)
                    continue
                rows.append(run_one(task, device_aug, seed))
                out_path.write_text(json.dumps({"rows": rows}, indent=1))
    # summary: per task, mean metric per pipeline + delta
    summary = {}
    for task in sorted({r["task"] for r in rows}):
        by = {p: [r["map50_95"] for r in rows if r["task"] == task and r["pipeline"] == p] for p in ("host_aug", "device_aug")}
        if all(by.values()):
            h, d = sum(by["host_aug"]) / len(by["host_aug"]), sum(by["device_aug"]) / len(by["device_aug"])
            summary[task] = {"host_map50_95": round(h, 4), "device_map50_95": round(d, 4), "delta": round(d - h, 4)}
    out_path.write_text(json.dumps({"rows": rows, "summary": summary}, indent=1))
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:] or ["detect", "segment", "pose"])
