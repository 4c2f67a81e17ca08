"""Inference result containers: Results / Boxes / Masks / Keypoints / Probs / OBB.

Capability parity with `ultralytics/engine/results.py:22-1806`: numpy-backed
(device arrays are pulled once, post-NMS), sliceable, with plot/save_txt/
save_crop/to_json/to_df conveniences.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from drone_yolo_tpu.ops.boxes import xyxy2xywh
from drone_yolo_tpu.utils import LOGGER, SimpleClass


class BaseTensor(SimpleClass):
    """Thin numpy wrapper with shape/slicing conveniences."""

    def __init__(self, data, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    @property
    def shape(self):
        return self.data.shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.__class__(self.data[idx], self.orig_shape)

    def numpy(self):
        return self.data

    def cpu(self):
        return self

    def tolist(self):
        return self.data.tolist()


class Boxes(BaseTensor):
    """Detection boxes (N, 6 or 7): xyxy, (track_id), conf, cls (reference results.py:1004)."""

    def __init__(self, boxes, orig_shape):
        boxes = np.asarray(boxes)
        if boxes.ndim == 1:
            boxes = boxes[None, :]
        assert boxes.shape[-1] in (6, 7), f"expected 6 or 7 columns, got {boxes.shape}"
        super().__init__(boxes, orig_shape)
        self.is_track = boxes.shape[-1] == 7

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, -3] if self.is_track else None

    @property
    def xywh(self):
        return np.asarray(xyxy2xywh(self.data[:, :4]))

    @property
    def xyxyn(self):
        d = self.data[:, :4].copy()
        d[:, [0, 2]] /= self.orig_shape[1]
        d[:, [1, 3]] /= self.orig_shape[0]
        return d

    @property
    def xywhn(self):
        d = self.xywh
        d[:, [0, 2]] /= self.orig_shape[1]
        d[:, [1, 3]] /= self.orig_shape[0]
        return d


class Masks(BaseTensor):
    """Segmentation masks (N, H, W) (reference results.py:1222)."""

    @property
    def xy(self):
        """Mask contours in pixel coords (list of (K,2) arrays)."""
        import cv2

        out = []
        for m in self.data.astype(np.uint8):
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32) if contours else np.zeros((0, 2), np.float32)
            sx = self.orig_shape[1] / m.shape[1]
            sy = self.orig_shape[0] / m.shape[0]
            out.append(c * np.array([sx, sy], np.float32))
        return out


class Keypoints(BaseTensor):
    """Pose keypoints (N, K, 2|3) (reference results.py:1407)."""

    def __init__(self, keypoints, orig_shape):
        keypoints = np.asarray(keypoints)
        if keypoints.ndim == 2:  # single instance (K, 2|3) — keep the instance dim (reference results.py:1438)
            keypoints = keypoints[None, :]
        super().__init__(keypoints, orig_shape)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        d = self.data[..., :2].copy()
        d[..., 0] /= self.orig_shape[1]
        d[..., 1] /= self.orig_shape[0]
        return d

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs(BaseTensor):
    """Classification probabilities (nc,) (reference results.py:1502)."""

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return self.data.argsort()[::-1][:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBB(BaseTensor):
    """Oriented boxes (N, 7|8): xywhr, (id), conf, cls (reference results.py:1572)."""

    def __init__(self, boxes, orig_shape):
        boxes = np.asarray(boxes)
        if boxes.ndim == 1:
            boxes = boxes[None, :]
        super().__init__(boxes, orig_shape)
        self.is_track = boxes.shape[-1] == 8

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, -3] if self.is_track else None

    @property
    def xyxyxyxy(self):
        """Corner representation (N, 4, 2)."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx1, dy1 = w / 2 * cos, w / 2 * sin
        dx2, dy2 = -h / 2 * sin, h / 2 * cos
        pts = np.stack(
            [
                np.stack([cx + dx1 + dx2, cy + dy1 + dy2], -1),
                np.stack([cx + dx1 - dx2, cy + dy1 - dy2], -1),
                np.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1),
                np.stack([cx - dx1 + dx2, cy - dy1 + dy2], -1),
            ],
            axis=1,
        )
        return pts

    @property
    def xyxyxyxyn(self):
        """Normalized corner representation (N, 4, 2) (reference results.py:1750)."""
        pts = self.xyxyxyxy.copy()
        pts[..., 0] /= self.orig_shape[1]
        pts[..., 1] /= self.orig_shape[0]
        return pts

    @property
    def xyxy(self):
        """Axis-aligned hull of the rotated box (reference results.py:1772)."""
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=-1)


class Results(SimpleClass):
    """Single-image inference result (reference results.py:187)."""

    def __init__(self, orig_img, path, names, boxes=None, masks=None, probs=None, keypoints=None, obb=None, speed=None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        # empty detections still yield a len-0 Boxes (reference results.py:661:
        # `self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None`
        # — the predictor always passes a tensor, so user code can len() it)
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.probs = Probs(probs, self.orig_shape) if probs is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBB(obb, self.orig_shape) if obb is not None and len(obb) else None
        self.speed = speed or {"preprocess": None, "inference": None, "postprocess": None}
        self.names = names
        self.path = path
        self.save_dir = None

    def __len__(self):
        for k in ("boxes", "masks", "probs", "keypoints", "obb"):
            v = getattr(self, k)
            if v is not None:
                return len(v)
        return 0

    def __getitem__(self, idx):
        r = Results(self.orig_img, self.path, self.names, speed=self.speed)
        for k in ("boxes", "masks", "keypoints", "obb"):
            v = getattr(self, k)
            if v is not None:
                setattr(r, k, v[idx])
        r.probs = self.probs
        return r

    def new(self):
        return Results(self.orig_img, self.path, self.names, speed=self.speed)

    def update(self, boxes=None, masks=None, probs=None, obb=None, keypoints=None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = probs
        if obb is not None:
            self.obb = OBB(obb, self.orig_shape)
        if keypoints is not None:
            self.keypoints = Keypoints(keypoints, self.orig_shape)

    def plot(self, conf: bool = True, line_width=None, labels: bool = True, boxes: bool = True, masks: bool = True, probs: bool = True, color_mode: str = "class", img=None):
        """Draw detections on the image; returns annotated BGR numpy array."""
        from drone_yolo_tpu.utils.plotting import Annotator, colors

        annotator = Annotator(
            (img if img is not None else self.orig_img).copy(),
            line_width=line_width,
            example=str(self.names),
        )
        if self.masks is not None and masks:
            annotator.masks(self.masks.data, [colors(int(c), True) for c in (self.boxes.cls if self.boxes else range(len(self.masks)))])
        if self.boxes is not None and boxes:
            for d in self.boxes.data:
                c = int(d[-1])
                name = self.names.get(c, str(c)) if isinstance(self.names, dict) else self.names[c]
                label = (f"{name} {d[-2]:.2f}" if conf else name) if labels else None
                annotator.box_label(d[:4], label, color=colors(c, True))
        if self.obb is not None and boxes:
            for d in self.obb.data:
                c = int(d[-1])
                name = self.names.get(c, str(c)) if isinstance(self.names, dict) else self.names[c]
                label = (f"{name} {d[-2]:.2f}" if conf else name) if labels else None
                annotator.obb_label(OBB(d[None], self.orig_shape).xyxyxyxy[0], label, color=colors(c, True))
        if self.keypoints is not None:
            for k in self.keypoints.data:
                annotator.kpts(k, self.orig_shape)
        if self.probs is not None and probs:
            text = "\n".join(f"{self.probs.data[j]:.2f} {self.names.get(j, j) if isinstance(self.names, dict) else self.names[j]}" for j in self.probs.top5)
            annotator.text((8, 8), text)
        return annotator.result()

    def save(self, filename=None):
        import cv2

        filename = filename or f"results_{Path(self.path).name}"
        cv2.imwrite(str(filename), self.plot())
        return filename

    def show(self):  # pragma: no cover - needs display
        import cv2

        cv2.imshow("results", self.plot())
        cv2.waitKey(0)

    def save_txt(self, txt_file, save_conf: bool = False):
        """Save boxes to a YOLO-format txt (reference results.py:760)."""
        texts = []
        if self.probs is not None:
            texts = [f"{self.probs.data[j]:.2f} {self.names.get(j, j)}" for j in self.probs.top5]
        elif self.boxes is not None:
            h, w = self.orig_shape
            for d in self.boxes.data:
                c, conf_v = int(d[-1]), float(d[-2])
                box = np.asarray(xyxy2xywh(d[None, :4]))[0] / np.array([w, h, w, h])
                line = (c, *box.tolist()) + ((conf_v,) if save_conf else ())
                texts.append(("%g " * len(line)).rstrip() % line)
        if texts:
            Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
            with open(txt_file, "a", encoding="utf-8") as f:
                f.writelines(t + "\n" for t in texts)

    def save_crop(self, save_dir, file_name=Path("im.jpg")):
        """Save cropped detections (reference results.py:800)."""
        import cv2

        if self.boxes is None:
            return
        save_dir = Path(save_dir)
        for d in self.boxes.data:
            c = int(d[-1])
            name = self.names.get(c, str(c)) if isinstance(self.names, dict) else self.names[c]
            x1, y1, x2, y2 = (int(v) for v in d[:4])
            crop = self.orig_img[max(y1, 0) : y2, max(x1, 0) : x2]
            out = save_dir / name / f"{Path(file_name).stem}.jpg"
            out.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(out), crop)

    def summary(self, normalize: bool = False, decimals: int = 5):
        """List-of-dicts summary (reference results.py:836 to_json precursor)."""
        out = []
        if self.probs is not None:
            return [{"name": self.names.get(self.probs.top1, self.probs.top1), "class": self.probs.top1, "confidence": round(self.probs.top1conf, decimals)}]
        h, w = self.orig_shape if normalize else (1, 1)
        data = self.boxes or self.obb
        if data is None:
            return out
        is_obb = self.obb is not None
        for i, d in enumerate(data.data):
            c, conf_v = int(d[-1]), float(d[-2])
            box = d[:5] if is_obb else d[:4]
            rec = {
                "name": self.names.get(c, str(c)) if isinstance(self.names, dict) else self.names[c],
                "class": c,
                "confidence": round(conf_v, decimals),
                "box": {k: round(float(v) / (w if k in "x1x2" else h), decimals) for k, v in zip(["x1", "y1", "x2", "y2", "r"][: len(box)], box)},
            }
            if self.masks is not None:
                xy = self.masks[i].xy[0]
                rec["segments"] = {"x": (xy[:, 0] / w).round(decimals).tolist(), "y": (xy[:, 1] / h).round(decimals).tolist()}
            if self.keypoints is not None:
                k = self.keypoints[i].data[0]
                rec["keypoints"] = {
                    "x": (k[:, 0] / w).round(decimals).tolist(),
                    "y": (k[:, 1] / h).round(decimals).tolist(),
                    **({"visible": k[:, 2].round(decimals).tolist()} if k.shape[-1] == 3 else {}),
                }
            out.append(rec)
        return out

    def to_json(self, normalize: bool = False, decimals: int = 5):
        return json.dumps(self.summary(normalize, decimals), indent=2)

    tojson = to_json  # deprecated alias (reference results.py:906)

    def to_df(self, normalize: bool = False, decimals: int = 5):
        import pandas as pd

        return pd.DataFrame(self.summary(normalize, decimals))

    def to_csv(self, normalize: bool = False, decimals: int = 5, **kwargs):
        """CSV string of the summary (reference results.py:851)."""
        return self.to_df(normalize, decimals).to_csv(**kwargs)

    def to_xml(self, normalize: bool = False, decimals: int = 5, **kwargs):
        """XML string of the summary (reference results.py:878)."""
        df = self.to_df(normalize, decimals)
        return df.to_xml(**kwargs) if len(df) else '<?xml version=\'1.0\' encoding=\'utf-8\'?>\n<root></root>'

    def to_sql(self, table_name: str = "results", normalize: bool = False, decimals: int = 5, db_path: str = "results.db"):
        """Write the summary into an SQLite table (reference results.py:945).

        Nested box/segments/keypoints dicts are stored as JSON text columns,
        matching the reference's json.dumps-per-column behavior."""
        import sqlite3

        recs = self.summary(normalize, decimals)
        conn = sqlite3.connect(db_path)
        try:
            cur = conn.cursor()
            cols = ["name", "class", "confidence", "box", "masks", "kpts"]
            cur.execute(
                f'CREATE TABLE IF NOT EXISTS "{table_name}" '
                "(id INTEGER PRIMARY KEY AUTOINCREMENT, name TEXT, class INTEGER, confidence REAL, box TEXT, masks TEXT, kpts TEXT)"
            )
            for r in recs:
                row = (
                    r.get("name"),
                    r.get("class"),
                    r.get("confidence"),
                    json.dumps(r.get("box", {})),
                    json.dumps(r.get("segments", {})),
                    json.dumps(r.get("keypoints", {})),
                )
                cur.execute(f'INSERT INTO "{table_name}" ({", ".join(cols)}) VALUES (?, ?, ?, ?, ?, ?)', row)
            conn.commit()
        finally:
            conn.close()

    def verbose(self):
        """Log string like '2 persons, 1 bus'."""
        if self.probs is not None:
            return ", ".join(f"{self.names.get(j, j)} {self.probs.data[j]:.2f}" for j in self.probs.top5) + ", "
        data = self.boxes or self.obb
        if data is None or len(data) == 0:
            return "(no detections), "
        counts = {}
        for c in data.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return "".join(f"{n} {self.names.get(c, c) if isinstance(self.names, dict) else self.names[c]}{'s' * (n > 1)}, " for c, n in sorted(counts.items()))
