"""Dense small-object synthetic dataset: the VisDrone stand-in for the flagship
accuracy-parity benchmark (zero-egress, so no real VisDrone download).

Drone-view characteristics reproduced (the ones the P2 head exists for,
reference README.md:3-5): 100+ objects per image, object sizes 6-24 px at the
train resolution (stride-4/8 territory), cluttered textured background with
distractor blobs, mild scale/appearance jitter, multiple visually-similar
classes so classification is not trivial.

Deterministic per seed. YOLO-format labels + data.yaml, same layout the
reference's check_det_dataset expects.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

# class -> (base BGR-ish color, shape); colors deliberately include two
# near-reds and two near-greens so class discrimination needs shape too
CLASSES = [
    ("car", (210, 50, 40), "rect"),
    ("van", (230, 110, 60), "rect_border"),
    ("person", (40, 200, 60), "circle"),
    ("bike", (90, 220, 110), "cross"),
    ("truck", (60, 80, 220), "rect_long"),
    ("awning", (220, 200, 50), "triangle"),
]


def _background(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Cluttered background: low-freq gradient + noise + gray distractor blobs."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 95 + 25 * np.sin(xx / w * math.pi * rng.uniform(1, 3) + rng.uniform(0, 6))
    base = base + 20 * np.cos(yy / h * math.pi * rng.uniform(1, 3) + rng.uniform(0, 6))
    img = np.stack([base + rng.uniform(-12, 12) for _ in range(3)], -1)
    img += rng.normal(0, 9, (h, w, 3))
    # distractor blobs: unlabeled gray-ish rectangles (road furniture)
    for _ in range(int(rng.integers(6, 14))):
        bw, bh = int(rng.integers(10, 40)), int(rng.integers(10, 40))
        x1, y1 = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
        g = rng.uniform(60, 150)
        img[y1 : y1 + bh, x1 : x1 + bw] = g + rng.normal(0, 5, (bh, bw, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _draw_object(img: np.ndarray, x1: int, y1: int, w: int, h: int, cls: int, rng: np.random.Generator):
    color = np.array(CLASSES[cls][1], np.float32)
    color = np.clip(color + rng.normal(0, 14, 3), 0, 255)
    shape = CLASSES[cls][2]
    patch = img[y1 : y1 + h, x1 : x1 + w].astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    if shape in ("rect", "rect_long"):
        m = np.ones((h, w), bool)
    elif shape == "rect_border":
        m = np.ones((h, w), bool)
        t = max(1, min(h, w) // 4)
        inner = np.zeros((h, w), bool)
        inner[t : h - t, t : w - t] = True
        patch[inner] = patch[inner] * 0.3 + 40  # dark core, colored ring
    elif shape == "circle":
        m = ((yy - cy) / max(cy, 1)) ** 2 + ((xx - cx) / max(cx, 1)) ** 2 <= 1.0
    elif shape == "cross":
        t = max(1, min(h, w) // 3)
        m = (np.abs(yy - cy) <= t / 2) | (np.abs(xx - cx) <= t / 2)
    elif shape == "triangle":
        m = (yy / max(h - 1, 1)) >= np.abs(xx - cx) / max(cx, 1)
    else:
        m = np.ones((h, w), bool)
    patch[m] = patch[m] * 0.15 + color * 0.85
    img[y1 : y1 + h, x1 : x1 + w] = np.clip(patch, 0, 255).astype(np.uint8)


def make_dense_image(rng: np.random.Generator, size: int = 320, n_obj: tuple[int, int] = (90, 140), obj_px: tuple[int, int] = (6, 24), nc: int = 6):
    """One dense image + its labels [(cls, cx, cy, w, h) normalized]."""
    img = _background(rng, size, size)
    n = int(rng.integers(n_obj[0], n_obj[1] + 1))
    # jittered-grid placement: non-overlapping (tiny objects that overlap are
    # ambiguous for matching-based mAP and would just add eval noise)
    g = math.ceil(math.sqrt(n * 1.4))
    cells = [(r, c) for r in range(g) for c in range(g)]
    rng.shuffle(cells)
    cell = size / g
    labels = []
    for r, c in cells[:n]:
        cls = int(rng.integers(0, nc))
        lo, hi = obj_px
        hi_eff = max(lo + 1, min(hi, int(cell) - 1))
        w = int(rng.integers(lo, hi_eff + 1))
        h = int(rng.integers(lo, hi_eff + 1))
        if CLASSES[cls][2] == "rect_long":  # trucks: elongated
            w = min(int(w * 1.8), int(cell) - 1)
        max_dx = max(int(cell) - w, 1)
        max_dy = max(int(cell) - h, 1)
        x1 = min(int(c * cell) + int(rng.integers(0, max_dx)), size - w - 1)
        y1 = min(int(r * cell) + int(rng.integers(0, max_dy)), size - h - 1)
        _draw_object(img, x1, y1, w, h, cls, rng)
        labels.append((cls, (x1 + w / 2) / size, (y1 + h / 2) / size, w / size, h / size))
    return img, labels


def make_dense_dataset(root, n_train: int = 160, n_val: int = 96, size: int = 320, seed: int = 0, nc: int = 6, obj_px: tuple = (6, 24)):
    """Write the dataset to `root`; returns the data.yaml path."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img, labels = make_dense_image(rng, size=size, nc=nc, obj_px=obj_px)
            cv2.imwrite(str(root / "images" / split / f"{split}_{i:04d}.jpg"), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
            with open(root / "labels" / split / f"{split}_{i:04d}.txt", "w") as f:
                for lb in labels:
                    f.write(f"{lb[0]} {lb[1]:.6f} {lb[2]:.6f} {lb[3]:.6f} {lb[4]:.6f}\n")
    yaml_path = root / "data.yaml"
    names = "".join(f"  {i}: {CLASSES[i][0]}\n" for i in range(nc))
    yaml_path.write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnc: {nc}\nnames:\n{names}")
    return yaml_path


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dense_visdrone_proxy"
    p = make_dense_dataset(out)
    print(p)
