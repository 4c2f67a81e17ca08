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


def make_dataset_mixed(root, n_val=200, nc=4, seed=0, base=256):
    """Mixed-size/aspect val set for cross-framework mAP parity + rect-val tests.

    Uses a handful of aspect ratios so the reference's exact rect shape planner
    (ultralytics/data/base.py:261) yields a small, bounded set of batch shapes.
    """
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    aspects = [(1.0, 1.0), (0.75, 1.0), (1.0, 0.75), (9 / 16, 1.0), (1.0, 0.6)]
    (root / "images" / "val").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "val").mkdir(parents=True, exist_ok=True)
    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    for i in range(n_val):
        ah, aw = aspects[int(rng.integers(0, len(aspects)))]
        h, w = int(base * ah), int(base * aw)
        img = (rng.random((h, w, 3)) * 60 + 90).astype(np.uint8)
        labels = []
        for _ in range(int(rng.integers(1, 5))):
            cls = int(rng.integers(0, nc))
            bw = int(rng.integers(w // 8, w // 3))
            bh = int(rng.integers(h // 8, h // 3))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            img[y1 : y1 + bh, x1 : x1 + bw] = PALETTE[cls % len(PALETTE)]
            labels.append((cls, (x1 + bw / 2) / w, (y1 + bh / 2) / h, bw / w, bh / h))
        cv2.imwrite(str(root / "images" / "val" / f"val_{i:04d}.jpg"), img[:, :, ::-1])
        with open(root / "labels" / "val" / f"val_{i:04d}.txt", "w") as f:
            for cls, cx, cy, bw, bh in labels:
                f.write(f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
    # minimal train split so dataset checks pass
    img = np.full((base, base, 3), 120, np.uint8)
    cv2.imwrite(str(root / "images" / "train" / "train_0000.jpg"), img)
    (root / "labels" / "train" / "train_0000.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: thing{i}" for i in range(nc))
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n"
    )
    return yaml_path


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


def make_seg_dataset(root, n_val=120, nc=4, seed=0, size=256, n_train=1):
    """Segmentation set: filled convex polygons with exact polygon labels.

    Label rows are YOLO segment format: `cls x1 y1 x2 y2 ...` (normalized).
    Polygon = ellipse-ish K-gon around a random center so masks are nontrivial
    (not box-aligned) while staying exactly representable in both frameworks.
    """
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("val", n_val), ("train", n_train)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(0, nc))
                cx = float(rng.uniform(0.2, 0.8)) * size
                cy = float(rng.uniform(0.2, 0.8)) * size
                rx = float(rng.uniform(size / 12, size / 5))
                ry = float(rng.uniform(size / 12, size / 5))
                k = int(rng.integers(5, 9))
                ang0 = float(rng.uniform(0, 2 * np.pi))
                angs = ang0 + np.linspace(0, 2 * np.pi, k, endpoint=False)
                pts = np.stack([cx + rx * np.cos(angs), cy + ry * np.sin(angs)], 1)
                pts = np.clip(pts, 1, size - 2)
                cv2.fillPoly(img, [pts.astype(np.int32)], PALETTE[cls % len(PALETTE)])
                rows.append(f"{cls} " + " ".join(f"{v / size:.6f}" for v in pts.reshape(-1)))
            cv2.imwrite(str(root / "images" / split / f"{split}_{i:04d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{split}_{i:04d}.txt").write_text("\n".join(rows) + "\n")
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: thing{i}" for i in range(nc))
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n"
    )
    return yaml_path


def make_pose_dataset(root, n_val=100, nc=2, seed=0, size=256, nkpt=4, n_train=1):
    """Pose set: rectangles with `nkpt` corner keypoints (marked with dots).

    Label rows: `cls cx cy w h x1 y1 v1 ... xk yk vk` (normalized, v=2).
    Dataset yaml carries kpt_shape/flip_idx as the reference expects.
    """
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("val", n_val), ("train", n_train)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(0, nc))
                w = int(rng.integers(size // 6, size // 3))
                h = int(rng.integers(size // 6, size // 3))
                x1 = int(rng.integers(0, size - w))
                y1 = int(rng.integers(0, size - h))
                img[y1 : y1 + h, x1 : x1 + w] = PALETTE[cls % len(PALETTE)]
                # nkpt points on an inset ellipse inside the box (any nkpt)
                angs = np.linspace(0, 2 * np.pi, nkpt, endpoint=False)
                kx = x1 + w / 2 + 0.3 * w * np.cos(angs)
                ky = y1 + h / 2 + 0.3 * h * np.sin(angs)
                for j in range(nkpt):
                    cv2.circle(img, (int(kx[j]), int(ky[j])), 3, (250, 250, 250), -1)
                row = [cls, (x1 + w / 2) / size, (y1 + h / 2) / size, w / size, h / size]
                for j in range(nkpt):
                    row += [kx[j] / size, ky[j] / size, 2]
                rows.append(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v) for v in row))
            cv2.imwrite(str(root / "images" / split / f"{split}_{i:04d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{split}_{i:04d}.txt").write_text("\n".join(rows) + "\n")
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: thing{i}" for i in range(nc))
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\n"
        f"kpt_shape: [{nkpt}, 3]\nflip_idx: [{', '.join(str(j) for j in range(nkpt))}]\nnames:\n{names}\n"
    )
    return yaml_path


def make_obb_dataset(root, n_val=100, nc=2, seed=0, size=256, n_train=1):
    """OBB set: filled rotated rectangles, labels as 4 corner points
    (`cls x1 y1 x2 y2 x3 y3 x4 y4`, normalized — YOLO-OBB format)."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("val", n_val), ("train", n_train)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(0, nc))
                cx = float(rng.uniform(0.25, 0.75)) * size
                cy = float(rng.uniform(0.25, 0.75)) * size
                w = float(rng.uniform(size / 8, size / 4))
                h = float(rng.uniform(size / 8, size / 4))
                ang = float(rng.uniform(0, np.pi))
                ca, sa = np.cos(ang), np.sin(ang)
                dx = np.array([-w / 2, w / 2, w / 2, -w / 2])
                dy = np.array([-h / 2, -h / 2, h / 2, h / 2])
                xs = cx + dx * ca - dy * sa
                ys = cy + dx * sa + dy * ca
                pts = np.clip(np.stack([xs, ys], 1), 1, size - 2)
                cv2.fillPoly(img, [pts.astype(np.int32)], PALETTE[cls % len(PALETTE)])
                rows.append(f"{cls} " + " ".join(f"{v / size:.6f}" for v in pts.reshape(-1)))
            cv2.imwrite(str(root / "images" / split / f"{split}_{i:04d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{split}_{i:04d}.txt").write_text("\n".join(rows) + "\n")
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: thing{i}" for i in range(nc))
    yaml_path.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n"
    )
    return yaml_path
