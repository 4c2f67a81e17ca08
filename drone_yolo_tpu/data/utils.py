"""Dataset checking/verification utilities.

Capability parity with `ultralytics/data/utils.py:97-470` (img2label_paths,
verify_image_label, check_det_dataset, check_cls_dataset, polygon2mask).
No auto-download (zero-egress deployment): missing datasets raise with the
expected layout instead of fetching.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import DEFAULT_CFG, LOGGER, yaml_load

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm", "heic"}
DATASETS_DIR = Path(os.environ.get("YOLO_DATASETS_DIR", Path.cwd() / "datasets"))


def imread_rgb(path):
    """Decode an image file straight to RGB (reference base.py:161 imread+cvtColor).

    cv2>=4.10 decodes RGB natively (IMREAD_COLOR_RGB), skipping the BGR->RGB
    copy pass; older cv2 falls back to imread+cvtColor. Returns None on failure.
    """
    import cv2

    if hasattr(cv2, "IMREAD_COLOR_RGB"):
        return cv2.imread(str(path), cv2.IMREAD_COLOR_RGB)
    im = cv2.imread(str(path))
    return None if im is None else cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


def img2label_paths(img_paths):
    """…/images/xx.jpg -> …/labels/xx.txt (reference data/utils.py:48)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def get_hash(paths):
    """Size+name hash for cache validation (reference data/utils.py:57)."""
    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.sha256(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def verify_image_label(im_file, lb_file, num_cls: int, keypoint: bool = False, nkpt: int = 0, ndim: int = 0, single_cls: bool = False):
    """Validate one image/label pair (reference data/utils.py:97).

    Returns (im_file, lb (N, 5|5+nk), shape (h, w), segments, keypoints, nm, nf, ne, nc_bad, msg).
    """
    nm = nf = ne = nc_bad = 0
    msg = ""
    segments, keypoints = [], None
    try:
        from PIL import Image

        with Image.open(im_file) as im:
            im.verify()
            shape = (im.height, im.width)
            fmt = (im.format or "").lower()
        if shape[0] < 10 or shape[1] < 10:
            raise ValueError(f"image size {shape} <10 pixels")
        if fmt not in IMG_FORMATS:
            raise ValueError(f"invalid image format {fmt}")

        if os.path.isfile(lb_file):
            nf = 1
            with open(lb_file, encoding="utf-8") as f:
                rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
            if any(len(r) > 6 for r in rows) and not keypoint:  # segment labels
                classes = np.array([r[0] for r in rows], dtype=np.float32)
                segments = [np.array(r[1:], dtype=np.float32).reshape(-1, 2) for r in rows]
                boxes = np.array([_segment2box_norm(s) for s in segments], dtype=np.float32)
                lb = np.concatenate([classes.reshape(-1, 1), boxes], 1)
            else:
                lb = np.array(rows, dtype=np.float32) if rows else np.zeros((0, (5 + nkpt * ndim) if keypoint else 5), np.float32)
            n = len(lb)
            if n:
                if keypoint:
                    assert lb.shape[1] == 5 + nkpt * ndim, f"labels require {5 + nkpt * ndim} columns"
                    kpts = lb[:, 5:].reshape(-1, nkpt, ndim)
                    if ndim == 2:
                        kpts = np.concatenate([kpts, np.ones_like(kpts[..., :1])], axis=-1)
                    keypoints = kpts
                    lb = lb[:, :5]
                assert lb.shape[1] == 5, f"labels require 5 columns, got {lb.shape[1]}"
                pts = lb[:, 1:]
                assert pts.max() <= 1.01, f"non-normalized or out-of-bounds coordinates {pts[pts > 1.01]}"
                assert lb.min() >= -0.01, f"negative label values {lb[lb < -0.01]}"
                if single_cls:
                    lb[:, 0] = 0
                max_cls = int(lb[:, 0].max())
                assert max_cls < num_cls, f"label class {max_cls} exceeds dataset nc={num_cls}"
                _, idx = np.unique(lb, axis=0, return_index=True)
                if len(idx) < n:
                    lb = lb[np.sort(idx)]
                    if segments:
                        segments = [segments[i] for i in np.sort(idx)]
                    msg = f"removed {n - len(idx)} duplicate labels"
            else:
                ne = 1
        else:
            nm = 1
            lb = np.zeros((0, 5), np.float32)
        return im_file, lb, shape, segments, keypoints, nm, nf, ne, nc_bad, msg
    except (ValueError, AssertionError, OSError) as e:
        return None, None, None, [], None, nm, nf, ne, 1, f"ignoring corrupt image/label {im_file}: {e}"


def _segment2box_norm(seg):
    x, y = seg[:, 0], seg[:, 1]
    x1, y1, x2, y2 = x.min(), y.min(), x.max(), y.max()
    return [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]


def polygon2mask(imgsz, polygons, color: int = 1, downsample_ratio: int = 1):
    """Rasterize polygon(s) to a mask (reference data/utils.py:217)."""
    import cv2

    mask = np.zeros(imgsz, dtype=np.uint8)
    polygons = np.asarray(polygons, dtype=np.int32).reshape(len(polygons), -1, 2)
    cv2.fillPoly(mask, polygons, color=color)
    if downsample_ratio > 1:
        nh, nw = imgsz[0] // downsample_ratio, imgsz[1] // downsample_ratio
        mask = cv2.resize(mask, (nw, nh))
    return mask


def polygons2masks_overlap(imgsz, segments, downsample_ratio: int = 1):
    """Overlapping instance masks -> single index mask (reference data/utils.py:253)."""
    masks = np.zeros((imgsz[0] // downsample_ratio, imgsz[1] // downsample_ratio), dtype=np.uint8 if len(segments) <= 255 else np.int32)
    areas, ms = [], []
    for seg in segments:
        m = polygon2mask(imgsz, [seg.reshape(-1)], 1, downsample_ratio)
        ms.append(m)
        areas.append(m.sum())
    order = np.argsort(-np.asarray(areas))
    for i, oi in enumerate(order):
        masks = np.where(ms[oi], i + 1, masks)
    return masks, order


def check_det_dataset(dataset, autodownload: bool = False) -> dict:
    """Resolve and validate a detection dataset yaml (reference data/utils.py:301).

    Returns dict with train/val paths, nc, names, yaml_file, channels.
    """
    file = Path(dataset)
    if not file.exists():
        alt = DATASETS_DIR / file.name
        if alt.exists():
            file = alt
        else:
            raise FileNotFoundError(
                f"dataset yaml '{dataset}' not found (zero-egress build: place it at {file} or {alt})"
            )
    data = yaml_load(file, append_filename=True)
    for k in ("train", "val"):
        if k not in data and k == "val" and "validation" in data:
            data["val"] = data.pop("validation")
    if "names" not in data and "nc" not in data:
        raise SyntaxError(f"{dataset} requires 'names' or 'nc'")
    if "names" in data and isinstance(data["names"], (list, tuple)):
        data["names"] = dict(enumerate(data["names"]))
    if "names" not in data:
        data["names"] = {i: f"class_{i}" for i in range(data["nc"])}
    data["nc"] = len(data["names"])
    data["channels"] = data.get("channels", 3)

    path = Path(data.get("path") or Path(data.get("yaml_file", "")).parent)
    if not path.is_absolute():
        # resolution order: datasets dir, yaml-relative, or the yaml's own dir
        # (common case: the yaml sits inside the dataset root and names it)
        for cand in (DATASETS_DIR / path, Path(file).parent / path, Path(file).parent):
            if cand.exists() and any((cand / s).exists() for s in ("images", "train", data.get("train") or "")):
                path = cand.resolve()
                break
        else:
            path = (Path(file).parent / path).resolve()
    data["path"] = path
    for k in ("train", "val", "test", "minival"):
        if data.get(k):
            if isinstance(data[k], str):
                p = (path / data[k]).resolve()
                if not p.exists() and data[k].startswith("../"):
                    p = (path / data[k][3:]).resolve()
                data[k] = str(p)
            else:
                data[k] = [str((path / x).resolve()) for x in data[k]]
    val = data.get("val")
    if val:
        missing = [v for v in ([val] if isinstance(val, str) else val) if not Path(v).exists()]
        if missing:
            raise FileNotFoundError(f"dataset images not found: {missing} (autodownload disabled in zero-egress build)")
    return data


def check_cls_dataset(dataset, split: str = "") -> dict:
    """Validate a classification dataset folder (reference data/utils.py:394)."""
    path = Path(dataset)
    if not path.is_dir():
        alt = DATASETS_DIR / path
        if alt.is_dir():
            path = alt
        else:
            raise FileNotFoundError(f"classification dataset '{dataset}' not found")
    train = path / "train"
    val = path / "val" if (path / "val").exists() else (path / "validation" if (path / "validation").exists() else None)
    test = path / "test" if (path / "test").exists() else None
    if not train.exists():
        raise FileNotFoundError(f"{path} missing train/ directory")
    names = sorted(d.name for d in train.iterdir() if d.is_dir())
    return {"train": train, "val": val, "test": test, "nc": len(names), "names": dict(enumerate(names))}


class DatasetStats:
    """Dataset statistics JSON + compressed preview images (reference
    data/utils.py:472 HUBDatasetStats, minus the HUB upload: zero-egress).

    Produces the same stats schema: per-split instance/image per-class counts
    and rounded per-image label lists, written to `<dataset>-hub/stats.json`.
    """

    def __init__(self, path="data.yaml", task: str = "detect"):
        from drone_yolo_tpu.utils import LOGGER, yaml_load

        self.task = task
        if task == "classify":
            data = check_cls_dataset(path)
            data["path"] = Path(path)
        else:
            data = check_det_dataset(path)
            data.setdefault("path", Path(str(path)).resolve().parent)
        self.hub_dir = Path(f"{data['path']}-hub")
        self.im_dir = self.hub_dir / "images"
        names = data["names"]
        names = list(names.values()) if isinstance(names, dict) else list(names)
        self.stats = {"nc": len(names), "names": names}
        self.data = data
        LOGGER.info(f"Dataset stats for {path} (task={task})")

    def _round(self, labels: dict):
        """[cls, *coords(4dp)] rows per instance (reference _round)."""
        if self.task == "detect":
            coords = labels["bboxes_n"]
        elif self.task in {"segment", "obb"}:
            coords = [np.asarray(s).flatten() for s in labels["segments"]]
        elif self.task == "pose":
            kpts = np.asarray(labels["keypoints"])
            n = len(labels["cls"])
            coords = np.concatenate([np.asarray(labels["bboxes_n"]), kpts.reshape(n, -1)], 1) if n else []
        else:
            raise ValueError(f"Undefined dataset task={self.task}")
        return [[int(c), *(round(float(x), 4) for x in pts)] for c, pts in zip(np.asarray(labels["cls"]).flatten(), coords)]

    def get_json(self, save: bool = False):
        """Compute (and optionally save) the stats dict."""
        import json

        from drone_yolo_tpu.utils import LOGGER

        nc = self.stats["nc"]
        for split in ("train", "val", "test"):
            self.stats[split] = None
            path = self.data.get(split)
            if path is None:
                continue
            if self.task == "classify":
                files = [f for f in Path(path).rglob("*.*") if f.suffix[1:].lower() in IMG_FORMATS]
                if not files:
                    continue
                classes = sorted(d.name for d in Path(path).iterdir() if d.is_dir())
                x = np.zeros(len(classes), int)
                labels = []
                for f in files:
                    ci = classes.index(f.parent.name) if f.parent.name in classes else -1
                    if ci >= 0:
                        x[ci] += 1
                        labels.append({f.name: ci})
                self.stats[split] = {
                    "instance_stats": {"total": int(x.sum()), "per_class": x.tolist()},
                    "image_stats": {"total": len(files), "unlabelled": 0, "per_class": x.tolist()},
                    "labels": labels,
                }
                continue
            from drone_yolo_tpu.data.dataset import YOLODataset

            ds = YOLODataset(img_path=path, data=self.data, task=self.task, augment=False)
            x = np.array(
                [np.bincount(np.asarray(lb["cls"]).astype(int).flatten(), minlength=nc) for lb in ds.labels]
            ).reshape(-1, nc)
            self.stats[split] = {
                "instance_stats": {"total": int(x.sum()), "per_class": x.sum(0).tolist()},
                "image_stats": {
                    "total": len(ds.labels),
                    "unlabelled": int(np.all(x == 0, 1).sum()),
                    "per_class": (x > 0).sum(0).tolist(),
                },
                "labels": [{Path(lb["im_file"]).name: self._round(lb)} for lb in ds.labels],
            }
        if save:
            self.hub_dir.mkdir(parents=True, exist_ok=True)
            p = self.hub_dir / "stats.json"
            with open(p, "w") as f:
                json.dump(self.stats, f)
            LOGGER.info(f"Saved {p}")
        return self.stats

    def process_images(self, max_dim: int = 1920, quality: int = 50):
        """Compressed preview copies of every image (reference process_images)."""
        import cv2

        self.im_dir.mkdir(parents=True, exist_ok=True)
        for split in ("train", "val", "test"):
            if self.data.get(split) is None:
                continue
            for f in Path(self.data[split]).rglob("*.*"):
                if f.suffix[1:].lower() not in IMG_FORMATS:
                    continue
                im = cv2.imread(str(f))
                if im is None:
                    continue
                r = max_dim / max(im.shape[:2])
                if r < 1.0:
                    im = cv2.resize(im, (int(im.shape[1] * r), int(im.shape[0] * r)), interpolation=cv2.INTER_AREA)
                cv2.imwrite(str(self.im_dir / f.name), im, [cv2.IMWRITE_JPEG_QUALITY, quality])
        return self.im_dir
