"""Dataset format converters.

Capability parity with `ultralytics/data/converter.py` (convert_coco:221, DOTA
OBB conversion:421, yolo_bbox2segment:582) and coco class-id mapping tables.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER, TQDM


def coco91_to_coco80_class():
    """91-index paper classes -> 80 trained classes (reference converter.py:14)."""
    return [
        0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, None, 11, 12, None, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, None,
        24, 25, None, None, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, None, 40, 41, 42, 43, 44, 45,
        46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, None, 60, None, None, 61, None, 62, 63, 64, 65,
        66, 67, 68, 69, 70, 71, 72, None, 73, 74, 75, 76, 77, 78, 79, None,
    ]


def coco80_to_coco91_class():
    """80 trained classes -> 91-index paper ids (reference converter.py:9)."""
    x = coco91_to_coco80_class()
    out = [0] * 80
    for i91, i80 in enumerate(x):
        if i80 is not None:
            out[i80] = i91 + 1
    return out


def convert_coco(labels_dir: str, save_dir: str, use_segments: bool = False, use_keypoints: bool = False, cls91to80: bool = True):
    """COCO JSON annotations -> YOLO txt labels (reference converter.py:221)."""
    save_dir = Path(save_dir)
    coco80 = coco91_to_coco80_class()
    for json_file in sorted(Path(labels_dir).resolve().glob("*.json")):
        fn = save_dir / "labels" / json_file.stem.replace("instances_", "")
        fn.mkdir(parents=True, exist_ok=True)
        with open(json_file, encoding="utf-8") as f:
            data = json.load(f)
        images = {x["id"]: x for x in data["images"]}
        ann_by_img = defaultdict(list)
        for ann in data["annotations"]:
            ann_by_img[ann["image_id"]].append(ann)

        for img_id, anns in TQDM(ann_by_img.items(), desc=f"converting {json_file.name}"):
            img = images[img_id]
            h, w = img["height"], img["width"]
            lines = []
            for ann in anns:
                if ann.get("iscrowd"):
                    continue
                box = np.array(ann["bbox"], np.float64)
                box[:2] += box[2:] / 2
                box[[0, 2]] /= w
                box[[1, 3]] /= h
                if box[2] <= 0 or box[3] <= 0:
                    continue
                cid = ann["category_id"] - 1
                cls = coco80[cid] if cls91to80 else cid
                if cls is None:
                    continue
                if use_segments and ann.get("segmentation"):
                    seg = ann["segmentation"]
                    if isinstance(seg, list) and seg:
                        s = np.array(seg[0], np.float64).reshape(-1, 2)
                        s[:, 0] /= w
                        s[:, 1] /= h
                        coords = " ".join(f"{v:.6f}" for v in s.reshape(-1))
                        lines.append(f"{cls} {coords}")
                        continue
                if use_keypoints and ann.get("keypoints"):
                    k = np.array(ann["keypoints"], np.float64).reshape(-1, 3)
                    k[:, 0] /= w
                    k[:, 1] /= h
                    kp = " ".join(f"{x:.6f} {y:.6f} {int(v)}" for x, y, v in k)
                    lines.append(f"{cls} " + " ".join(f"{v:.6f}" for v in box) + f" {kp}")
                    continue
                lines.append(f"{cls} " + " ".join(f"{v:.6f}" for v in box))
            stem = Path(img["file_name"]).stem
            (fn / f"{stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
    LOGGER.info(f"COCO -> YOLO conversion complete: {save_dir}")


def convert_dota_to_yolo_obb(dota_root: str):
    """DOTA v1/v2 label format -> YOLO-OBB txt (reference converter.py:421)."""
    import cv2

    root = Path(dota_root)
    class_names = [
        "plane", "ship", "storage-tank", "baseball-diamond", "tennis-court", "basketball-court",
        "ground-track-field", "harbor", "bridge", "large-vehicle", "small-vehicle", "helicopter",
        "roundabout", "soccer-ball-field", "swimming-pool", "container-crane", "airport", "helipad",
    ]
    name2id = {n: i for i, n in enumerate(class_names)}
    for split in ("train", "val"):
        orig = root / "labelTxt" / split
        out = root / "labels" / split
        imgs = root / "images" / split
        if not orig.exists():
            continue
        out.mkdir(parents=True, exist_ok=True)
        for f in TQDM(sorted(orig.glob("*.txt")), desc=f"DOTA {split}"):
            img_path = next((imgs / f"{f.stem}{ext}" for ext in (".png", ".jpg") if (imgs / f"{f.stem}{ext}").exists()), None)
            if img_path is None:
                continue
            im = cv2.imread(str(img_path))
            h, w = im.shape[:2]
            lines = []
            for line in f.read_text().splitlines():
                parts = line.split()
                if len(parts) < 9 or parts[8] not in name2id:
                    continue
                coords = np.array(parts[:8], np.float64)
                coords[0::2] /= w
                coords[1::2] /= h
                lines.append(f"{name2id[parts[8]]} " + " ".join(f"{v:.6f}" for v in coords))
            (out / f.name).write_text("\n".join(lines) + ("\n" if lines else ""))


def yolo_bbox2segment(im_dir: str, save_dir: str | None = None):
    """Boxes -> 4-point segment labels (reference converter.py:582 simplified:
    rectangle polygons; the reference optionally refines with SAM)."""
    from drone_yolo_tpu.data.utils import img2label_paths

    im_dir = Path(im_dir)
    imgs = sorted(str(p) for p in im_dir.rglob("*.jpg"))
    save_dir = Path(save_dir or (im_dir.parent / "labels-segment"))
    save_dir.mkdir(parents=True, exist_ok=True)
    for im_file, lb_file in zip(imgs, img2label_paths(imgs)):
        if not Path(lb_file).exists():
            continue
        lines = []
        for row in Path(lb_file).read_text().splitlines():
            p = row.split()
            if len(p) != 5:
                lines.append(row)
                continue
            c, cx, cy, w, h = p[0], *map(float, p[1:])
            x1, y1, x2, y2 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
            lines.append(f"{c} {x1:.6f} {y1:.6f} {x2:.6f} {y1:.6f} {x2:.6f} {y2:.6f} {x1:.6f} {y2:.6f}")
        (save_dir / Path(lb_file).name).write_text("\n".join(lines) + "\n")
    LOGGER.info(f"bbox->segment labels written to {save_dir}")
