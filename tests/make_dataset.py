"""Synthetic tiny detection dataset generator (coco8-style, no downloads).

Images contain colored axis-aligned rectangles on textured backgrounds; labels
are exact YOLO-format normalized xywh. Deterministic per seed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

PALETTE = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)]


def make_image_with_boxes(rng, size=160, n_min=1, n_max=4, nc=4):
    img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
    labels = []
    for _ in range(rng.integers(n_min, n_max + 1)):
        cls = int(rng.integers(0, nc))
        w = int(rng.integers(size // 8, size // 3))
        h = int(rng.integers(size // 8, size // 3))
        x1 = int(rng.integers(0, size - w))
        y1 = int(rng.integers(0, size - h))
        color = PALETTE[cls % len(PALETTE)]
        img[y1 : y1 + h, x1 : x1 + w] = color
        cx, cy = (x1 + w / 2) / size, (y1 + h / 2) / size
        labels.append((cls, cx, cy, w / size, h / size))
    return img, labels


def make_dataset(root, n_train=8, n_val=4, size=160, nc=4, seed=0):
    """Create {root}/{images,labels}/{train,val} + data.yaml. Returns yaml path."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, labels = make_image_with_boxes(rng, size=size, nc=nc)
            cv2.imwrite(str(root / "images" / split / f"{split}_{i:03d}.jpg"), img[:, :, ::-1])
            with open(root / "labels" / split / f"{split}_{i:03d}.txt", "w") as f:
                for cls, cx, cy, w, h in labels:
                    f.write(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: thing{i}" for i in range(nc))
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n"
    )
    return yaml_path
