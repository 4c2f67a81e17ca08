"""OBB end-to-end: train on synthetic rotated boxes (4-point polygon labels)."""

from pathlib import Path

import numpy as np


def _make_obb_dataset(root, n_train=4, n_val=2, size=96, nc=2, seed=0):
    """Rotated rectangles as 4-corner polygon labels (DOTA-style YOLO-OBB)."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            lines = []
            for _ in range(rng.integers(1, 3)):
                cls = int(rng.integers(0, nc))
                cx, cy = rng.uniform(0.3, 0.7, 2) * size
                w, h = rng.uniform(size / 8, size / 4, 2)
                ang = rng.uniform(0, np.pi)
                pts = cv2.boxPoints(((cx, cy), (w, h), np.degrees(ang)))
                pts = np.clip(pts, 1, size - 1)
                cv2.fillPoly(img, [pts.astype(np.int32)], (220, 60, 60) if cls == 0 else (60, 220, 60))
                coords = " ".join(f"{px / size:.6f} {py / size:.6f}" for px, py in pts)
                lines.append(f"{cls} {coords}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines) + "\n")
    y = root / "data.yaml"
    names = "\n".join(f"  {i}: r{i}" for i in range(nc))
    y.write_text(f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n")
    return y


def test_obb_train_val(tmp_path):
    from drone_yolo_tpu import YOLO

    data = _make_obb_dataset(tmp_path / "obbset")
    m = YOLO("yolov8n-obb.yaml")
    assert m.task == "obb"
    m.train(data=str(data), epochs=1, imgsz=64, batch=2, workers=1, project=str(tmp_path), name="obb", plots=False, verbose=False, val=True)
    assert m.trainer.metrics is not None
    assert "metrics/mAP50(B)" in m.trainer.metrics
