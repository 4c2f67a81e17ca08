"""Segmentation mask-learning evidence run (VERDICT item 7, weak #1).

Trains yolov8n-seg on a synthetic shapes dataset on the REAL TPU chip and
reports per-epoch box AND mask mAP; the claim to substantiate is that mask
mAP50 visibly rises (> 0.2) — not just box mAP.

Run (axon TPU): python tools/seg_learning.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for direct invocation


def make_seg_dataset(root, n_train=96, n_val=24, size=160, nc=3, seed=0):
    """Filled circles / rectangles / triangles with exact polygon labels."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    colors = [(230, 60, 60), (60, 200, 60), (60, 80, 230)]
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 50 + 100).astype(np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(0, nc))
                cx, cy = rng.integers(30, size - 30, 2)
                r = int(rng.integers(12, 28))
                if cls == 0:  # circle -> 16-gon polygon
                    ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
                    poly = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
                elif cls == 1:  # rectangle
                    poly = np.array([[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r], [cx - r, cy + r]], float)
                else:  # triangle
                    poly = np.array([[cx, cy - r], [cx + r, cy + r], [cx - r, cy + r]], float)
                poly = np.clip(poly, 1, size - 2)
                cv2.fillPoly(img, [poly.astype(np.int32)], colors[cls])
                coords = " ".join(f"{x / size:.5f} {y / size:.5f}" for x, y in poly)
                lines.append(f"{cls} {coords}")
            cv2.imwrite(str(root / "images" / split / f"{split}_{i:04d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{split}_{i:04d}.txt").write_text("\n".join(lines) + "\n")
    yaml_path = root / "data.yaml"
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n"
        + "\n".join(f"  {i}: shape{i}" for i in range(nc))
    )
    return yaml_path


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    out_root = Path(os.environ.get("SEG_RUN_DIR", "/tmp/seg_learning"))
    data_yaml = make_seg_dataset(out_root / "data")
    epochs = int(os.environ.get("SEG_EPOCHS", 40))

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    m.train(
        data=str(data_yaml),
        epochs=epochs,
        imgsz=160,
        batch=16,
        nbs=16,
        workers=2,
        project=str(out_root),
        name="run",
        task="segment",
        val=True,
        plots=False,
        verbose=False,
        patience=epochs,
        mosaic=0.5,
    )
    import csv

    rows = list(csv.DictReader(open(out_root / "run" / "results.csv")))
    mask_key = next((k for k in rows[0] if "mAP50(M)" in k), None)
    box_key = next((k for k in rows[0] if "mAP50(B)" in k), None)
    series = {
        "box_mAP50": [round(float(r[box_key]), 4) for r in rows] if box_key else [],
        "mask_mAP50": [round(float(r[mask_key]), 4) for r in rows] if mask_key else [],
    }
    final = {
        "metric": "seg_learning_synthetic",
        "epochs": len(rows),
        "final_box_mAP50": series["box_mAP50"][-1] if series["box_mAP50"] else None,
        "final_mask_mAP50": series["mask_mAP50"][-1] if series["mask_mAP50"] else None,
        "best_mask_mAP50": max(series["mask_mAP50"]) if series["mask_mAP50"] else None,
        "series": series,
    }
    print(json.dumps(final))
    ok = final["best_mask_mAP50"] is not None and final["best_mask_mAP50"] > 0.2
    print(f"MASK LEARNING {'PROVEN' if ok else 'NOT YET PROVEN'} (threshold 0.2)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
