"""Host-side augmentation pipeline: mosaic, affine, HSV, flips, letterbox, mixup.

Capability parity with `ultralytics/data/augment.py` (Mosaic:490, MixUp:867,
RandomPerspective:952, RandomHSV:1303, RandomFlip:1392, LetterBox:1486,
CopyPaste:1643, Format:1935, v8_transforms:2287). numpy/cv2 on the host — the
TPU consumes fixed-shape, pre-padded batches; all raggedness dies here.

Sample dict convention (differs from the reference's Instances object — plain
arrays are cheaper to collate): img HWC uint8 RGB; cls (N,); bboxes (N, 4) pixel
xyxy; optional segments (list of (K, 2)); optional keypoints (N, K, 3) pixel.
"""

from __future__ import annotations

import math
import random
import threading

import numpy as np

from drone_yolo_tpu.ops.letterbox import letterbox_np
from drone_yolo_tpu.utils import LOGGER

# -- per-sample deterministic RNG ---------------------------------------------
# The reference seeds each dataloader worker process (data/build.py:89
# seed_worker), making runs reproducible for a FIXED num_workers. Our loader
# uses threads sharing one interpreter, so module-global `random` draws would
# interleave nondeterministically across workers. Instead every sample seeds a
# per-thread RNG from (seed, epoch, index) — augmentation is then reproducible
# independent of worker count and scheduling (stronger than the reference).
_thread_rng = threading.local()


def _rng() -> random.Random:
    r = getattr(_thread_rng, "rng", None)
    if r is None:
        r = random.Random(random.getrandbits(64))
        _thread_rng.rng = r
    return r


def _np_rng() -> np.random.Generator:
    g = getattr(_thread_rng, "np_rng", None)
    if g is None:
        g = np.random.default_rng(random.getrandbits(64))
        _thread_rng.np_rng = g
    return g


def seed_sample(seed: int, epoch: int, index: int):
    """Deterministically seed this thread's augmentation RNG for one sample.

    splitmix64 finalizer over the packed key — a plain polynomial mix aliases
    (epoch e, index i) with (epoch e+1, index i-M) on datasets larger than M,
    correlating augmentation streams across adjacent epochs."""
    h = (int(seed) & 0xFFFF) << 48 | (int(epoch) & 0xFFFF) << 32 | int(index) & 0xFFFFFFFF
    h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    h = (h ^ (h >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 31
    _rng().seed(h)
    _thread_rng.np_rng = np.random.default_rng(h)


class Compose:
    """Chain of transforms applied in order to a labels dict (reference augment.py:146)."""
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, labels):
        for t in self.transforms:
            labels = t(labels)
        return labels

    def append(self, t):
        self.transforms.append(t)

    def insert(self, i, t):
        self.transforms.insert(i, t)

    def __repr__(self):
        return f"Compose({', '.join(t.__class__.__name__ for t in self.transforms)})"


class Mosaic:
    """4- or 9-image mosaic (reference augment.py:490: _mosaic4 at :658,
    _mosaic9 at :716): images tiled on a 2s (or 3s, center-cropped to 2s)
    canvas, boxes shifted into canvas coords."""

    def __init__(self, dataset, imgsz: int = 640, p: float = 1.0, n: int = 4):
        assert n in (4, 9), "mosaic supports n=4 or n=9"
        self.dataset = dataset
        self.imgsz = imgsz
        self.p = p
        self.n = n
        self.border = (-imgsz // 2, -imgsz // 2)
        self._tls = threading.local()

    def _canvas(self, size: int):
        """Reused per-thread canvas: a fresh (2s,2s,3) np.full per sample costs
        more in page faults than the fill itself once the decode buffer holds
        memory. Safe to reuse because RandomPerspective always warps the mosaic
        canvas into a new array (border != 0) before the next sample starts on
        this thread."""
        c = getattr(self._tls, "canvas", None)
        if c is None or c.shape[0] != size:
            c = np.empty((size, size, 3), np.uint8)
            self._tls.canvas = c
        c.fill(114)
        return c

    def _pick(self, k: int):
        """Companion indices, three sources in priority order:

        1. the loader-set *sample window* — the trailing W indices of the epoch
           permutation before this sample's position. Deterministic given
           (seed, epoch), independent of worker scheduling, and hot in the
           decode buffer because those indices were just processed;
        2. the decoded-image buffer (reference augment.py:519 get_indexes:
           random.choices from dataset.buffer) — recency-correlated like the
           reference, but scheduling-dependent under threaded workers;
        3. uniform random (direct dataset[i] access outside a loader).
        """
        win = getattr(self.dataset, "sample_window", None)
        win = win() if callable(win) else None
        if win is not None:
            if len(win):
                return [int(x) for x in _rng().choices(list(win), k=k)]
            # epoch position 0: no history yet — seeded-uniform draw keeps
            # determinism without degenerating into a self-only mosaic
            return [_rng().randint(0, len(self.dataset) - 1) for _ in range(k)]
        buf = getattr(self.dataset, "buffer", None)
        if buf:
            return _rng().choices(list(buf), k=k)
        return [_rng().randint(0, len(self.dataset) - 1) for _ in range(k)]

    def __call__(self, labels):
        if _rng().random() > self.p:
            return labels
        if self.n == 9:
            return self._mosaic9(labels)
        s = self.imgsz
        yc = int(_rng().uniform(s // 2, 2 * s - s // 2))
        xc = int(_rng().uniform(s // 2, 2 * s - s // 2))
        mix = [labels] + [self.dataset.get_sample(i) for i in self._pick(3)]

        canvas = self._canvas(s * 2)
        cls_all, box_all, seg_all, kpt_all = [], [], [], []
        # open-vocabulary samples carry per-image "texts": merge into a union
        # vocabulary and remap each sample's local cls ids into it
        union_texts = None
        if any(lb.get("texts") is not None for lb in mix):
            union_texts, text_index = [], {}
            remaps = []
            for lb in mix:
                remap = {}
                for ci, t in enumerate(lb.get("texts") or []):
                    key = tuple(t) if isinstance(t, list) else t
                    if key not in text_index:
                        text_index[key] = len(union_texts)
                        union_texts.append(t)
                    remap[ci] = text_index[key]
                remaps.append(remap)
            mix = [
                {**lb, "cls": np.array([remaps[i].get(int(c), int(c)) for c in lb["cls"]], np.float32)}
                for i, lb in enumerate(mix)
            ]
        for i, lb in enumerate(mix):
            img = lb["img"]
            h, w = img.shape[:2]
            if i == 0:  # top-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top-right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom-right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            if len(lb["bboxes"]):
                b = lb["bboxes"] + np.array([padw, padh, padw, padh], np.float32)
                box_all.append(b)
                cls_all.append(lb["cls"])
                if lb.get("keypoints") is not None:
                    k = lb["keypoints"].copy()
                    k[..., 0] += padw
                    k[..., 1] += padh
                    kpt_all.append(k)
                # segments stay 1:1 with boxes (clip/affine filter them together)
                for seg in lb.get("segments", []) or []:
                    seg_all.append(seg + np.array([padw, padh], np.float32))

        out = {
            "img": canvas,
            "cls": np.concatenate(cls_all) if cls_all else np.zeros((0,), np.float32),
            "bboxes": np.concatenate(box_all) if box_all else np.zeros((0, 4), np.float32),
            "mosaic_border": self.border,
            "im_file": labels.get("im_file", ""),
            "ori_shape": labels.get("ori_shape", canvas.shape[:2]),
        }
        if union_texts is not None:
            out["texts"] = union_texts
        if seg_all:
            out["segments"] = seg_all
        if kpt_all:
            out["keypoints"] = np.concatenate(kpt_all)
        clip_sample(out, (s * 2, s * 2))
        return out

    def _mosaic9(self, labels):
        """9-image mosaic (reference augment.py:716 _mosaic9): 3x3 cell grid on a
        3s canvas, each image top-left-anchored in its cell, center-cropped to
        the same 2s output geometry as the 4-mosaic."""
        s = self.imgsz
        mix = [labels] + [self.dataset.get_sample(i) for i in self._pick(8)]
        canvas = self._canvas(s * 3)
        off = s // 2  # center-crop offset: 3s canvas -> 2s output
        cls_all, box_all, seg_all, kpt_all = [], [], [], []
        for i, lb in enumerate(mix):
            r, c = divmod(i, 3)
            img = lb["img"]
            h, w = img.shape[:2]
            y0, x0 = r * s, c * s
            h, w = min(h, s), min(w, s)
            canvas[y0 : y0 + h, x0 : x0 + w] = img[:h, :w]
            padw, padh = x0 - off, y0 - off  # into cropped coords
            if len(lb["bboxes"]):
                box_all.append(lb["bboxes"] + np.array([padw, padh, padw, padh], np.float32))
                cls_all.append(lb["cls"])
                if lb.get("keypoints") is not None:
                    k = lb["keypoints"].copy()
                    k[..., 0] += padw
                    k[..., 1] += padh
                    kpt_all.append(k)
                for seg in lb.get("segments", []) or []:
                    seg_all.append(seg + np.array([padw, padh], np.float32))
        out = {
            "img": np.ascontiguousarray(canvas[off : off + 2 * s, off : off + 2 * s]),
            "cls": np.concatenate(cls_all) if cls_all else np.zeros((0,), np.float32),
            "bboxes": np.concatenate(box_all) if box_all else np.zeros((0, 4), np.float32),
            "mosaic_border": self.border,
            "im_file": labels.get("im_file", ""),
            "ori_shape": labels.get("ori_shape", (2 * s, 2 * s)),
        }
        if seg_all:
            out["segments"] = seg_all
        if kpt_all:
            out["keypoints"] = np.concatenate(kpt_all)
        clip_sample(out, (s * 2, s * 2))
        return out


class MixUp:
    """Beta(32, 32) image blend (reference augment.py:867)."""

    def __init__(self, dataset, pre_transform=None, p: float = 0.0):
        self.dataset = dataset
        self.pre_transform = pre_transform
        self.p = p

    def __call__(self, labels):
        if _rng().random() > self.p:
            return labels
        other = self.dataset.get_sample(_rng().randint(0, len(self.dataset) - 1))
        if self.pre_transform is not None:
            other = self.pre_transform(other)
        if other["img"].shape != labels["img"].shape:
            return labels
        r = float(_np_rng().beta(32.0, 32.0))
        labels["img"] = (labels["img"] * r + other["img"] * (1 - r)).astype(np.uint8)
        labels["cls"] = np.concatenate([labels["cls"], other["cls"]])
        labels["bboxes"] = np.concatenate([labels["bboxes"], other["bboxes"]])
        if labels.get("keypoints") is not None and other.get("keypoints") is not None:
            labels["keypoints"] = np.concatenate([labels["keypoints"], other["keypoints"]])
        return labels


class CopyPaste:
    """Flip-mode segment copy-paste (reference augment.py:1643). Requires segments."""

    def __init__(self, p: float = 0.0):
        self.p = p

    def __call__(self, labels):
        segs = labels.get("segments")
        if self.p == 0 or not segs or _rng().random() > self.p:
            return labels
        import cv2

        img = labels["img"]
        h, w = img.shape[:2]
        n = len(segs)
        boxes = labels["bboxes"]
        # flip instances horizontally and paste where IoA with existing boxes is low
        flipped = boxes.copy()
        flipped[:, [0, 2]] = w - boxes[:, [2, 0]]
        ioa = _bbox_ioa(flipped, boxes)
        candidates = np.nonzero((ioa < 0.30).all(1))[0]
        new_cls, new_box, new_seg = [], [], []
        for j in _rng().sample(list(candidates), k=round(self.p * len(candidates))):
            seg = segs[j].copy()
            seg[:, 0] = w - seg[:, 0]
            mask = np.zeros((h, w), np.uint8)
            cv2.fillPoly(mask, [seg.astype(np.int32)], 1)
            img[mask.astype(bool)] = img[:, ::-1][mask.astype(bool)]
            new_cls.append(labels["cls"][j])
            new_box.append(flipped[j])
            new_seg.append(seg)
        if new_box:
            labels["cls"] = np.concatenate([labels["cls"], np.asarray(new_cls)])
            labels["bboxes"] = np.concatenate([labels["bboxes"], np.stack(new_box)])
            labels["segments"] = segs + new_seg
        return labels


class RandomPerspective:
    """Affine/perspective warp of image + boxes/segments/keypoints
    (reference augment.py:952). Consumes `mosaic_border` to crop the 2s canvas
    back to s, and filters degenerate boxes."""

    def __init__(self, degrees=0.0, translate=0.1, scale=0.5, shear=0.0, perspective=0.0, border=(0, 0), pre_transform=None):
        self.degrees, self.translate, self.scale = degrees, translate, scale
        self.shear, self.perspective = shear, perspective
        self.border = border
        self.pre_transform = pre_transform

    def __call__(self, labels):
        import cv2

        if self.pre_transform is not None and "mosaic_border" not in labels:
            labels = self.pre_transform(labels)
        border = labels.pop("mosaic_border", self.border)
        img = labels["img"]
        h, w = img.shape[:2]
        out_h, out_w = h + border[0] * 2, w + border[1] * 2

        # transform matrix (center -> perspective -> rotation/scale -> shear -> translate)
        C = np.eye(3)
        C[0, 2], C[1, 2] = -w / 2, -h / 2
        P = np.eye(3)
        P[2, 0] = _rng().uniform(-self.perspective, self.perspective)
        P[2, 1] = _rng().uniform(-self.perspective, self.perspective)
        R = np.eye(3)
        a = _rng().uniform(-self.degrees, self.degrees)
        s = _rng().uniform(1 - self.scale, 1 + self.scale)
        R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
        S = np.eye(3)
        S[0, 1] = math.tan(_rng().uniform(-self.shear, self.shear) * math.pi / 180)
        S[1, 0] = math.tan(_rng().uniform(-self.shear, self.shear) * math.pi / 180)
        T = np.eye(3)
        T[0, 2] = _rng().uniform(0.5 - self.translate, 0.5 + self.translate) * out_w
        T[1, 2] = _rng().uniform(0.5 - self.translate, 0.5 + self.translate) * out_h
        Mt = T @ S @ R @ P @ C

        if (border[0] != 0) or (border[1] != 0) or (Mt != np.eye(3)).any():
            if self.perspective:
                img = cv2.warpPerspective(img, Mt, dsize=(out_w, out_h), borderValue=(114, 114, 114))
            else:
                img = cv2.warpAffine(img, Mt[:2], dsize=(out_w, out_h), borderValue=(114, 114, 114))

        boxes = labels["bboxes"]
        segments = labels.get("segments")
        n = len(boxes)
        new_boxes = np.zeros((0, 4), np.float32)
        keep = np.zeros((0,), bool)
        new_segments = None
        if n and segments and len(segments) == n:
            # warp segment polygons; boxes re-derived from warped segments
            # (reference augment.py apply_segments)
            new_segments = []
            sb = []
            for seg in segments:
                pts = np.ones((len(seg), 3), np.float32)
                pts[:, :2] = seg
                pts = pts @ Mt.T
                p2 = pts[:, :2] / pts[:, 2:3] if self.perspective else pts[:, :2]
                p2[:, 0] = p2[:, 0].clip(0, out_w)
                p2[:, 1] = p2[:, 1].clip(0, out_h)
                new_segments.append(p2.astype(np.float32))
                sb.append([p2[:, 0].min(), p2[:, 1].min(), p2[:, 0].max(), p2[:, 1].max()])
            new_boxes = np.asarray(sb, np.float32)
            keep = _box_candidates(boxes.T * s, new_boxes.T, area_thr=0.01)
            new_segments = [sg for sg, k in zip(new_segments, keep) if k]
        elif n:
            pts = np.ones((n * 4, 3), np.float32)
            pts[:, :2] = boxes[:, [0, 1, 2, 1, 2, 3, 0, 3]].reshape(n * 4, 2)
            pts = pts @ Mt.T
            pts = (pts[:, :2] / pts[:, 2:3] if self.perspective else pts[:, :2]).reshape(n, 8)
            xs, ys = pts[:, [0, 2, 4, 6]], pts[:, [1, 3, 5, 7]]
            new_boxes = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1).astype(np.float32)
            new_boxes[:, [0, 2]] = new_boxes[:, [0, 2]].clip(0, out_w)
            new_boxes[:, [1, 3]] = new_boxes[:, [1, 3]].clip(0, out_h)
            keep = _box_candidates(boxes.T * s, new_boxes.T, area_thr=0.10)

        labels["img"] = img
        labels["bboxes"] = new_boxes[keep]
        labels["cls"] = labels["cls"][keep] if n else labels["cls"]
        if new_segments is not None:
            labels["segments"] = new_segments
            labels.pop("mosaic_border", None)
            if labels.get("keypoints") is not None:
                labels["keypoints"] = labels["keypoints"][keep]
            return labels
        if labels.get("keypoints") is not None and n:
            k = labels["keypoints"][keep]
            if len(k):
                kp = np.ones((k.shape[0] * k.shape[1], 3), np.float32)
                kp[:, :2] = k[..., :2].reshape(-1, 2)
                kp = kp @ Mt.T
                kp = kp[:, :2] / kp[:, 2:3] if self.perspective else kp[:, :2]
                vis = k[..., 2].reshape(-1)
                oob = (kp[:, 0] < 0) | (kp[:, 0] > out_w) | (kp[:, 1] < 0) | (kp[:, 1] > out_h)
                vis = np.where(oob, 0.0, vis)
                labels["keypoints"] = np.concatenate([kp, vis[:, None]], -1).reshape(k.shape[0], k.shape[1], 3)
            else:
                labels["keypoints"] = k
        labels.pop("segments", None)  # segments are warped into boxes for detect; seg task re-derives
        return labels


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate warped boxes (reference augment.py:1280 box_candidates)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def _bbox_ioa(box1, box2, eps=1e-7):
    """Intersection over box2 area (reference utils/metrics.py bbox_ioa)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:]
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(-1)
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area2[None] + eps)


class RandomHSV:
    """HSV jitter (reference augment.py:1303)."""

    def __init__(self, hgain=0.5, sgain=0.5, vgain=0.5):
        self.hgain, self.sgain, self.vgain = hgain, sgain, vgain

    def __call__(self, labels):
        import cv2

        if not (self.hgain or self.sgain or self.vgain):
            return labels
        img = labels["img"]
        r = _np_rng().uniform(-1, 1, 3) * [self.hgain, self.sgain, self.vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_h = ((x * r[0]) % 180).astype(img.dtype)
        lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
        hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
        labels["img"] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return labels


class RandomFlip:
    """Horizontal/vertical flip with keypoint index remap (reference augment.py:1392)."""

    def __init__(self, p=0.5, direction="horizontal", flip_idx=None):
        assert direction in {"horizontal", "vertical"}
        self.p, self.direction, self.flip_idx = p, direction, flip_idx

    def __call__(self, labels):
        if _rng().random() >= self.p:
            return labels
        img = labels["img"]
        h, w = img.shape[:2]
        boxes = labels["bboxes"]
        if self.direction == "horizontal":
            labels["img"] = np.ascontiguousarray(img[:, ::-1])
            if len(boxes):
                boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
            if labels.get("segments"):
                for seg in labels["segments"]:
                    seg[:, 0] = w - seg[:, 0]
            if labels.get("keypoints") is not None:
                k = labels["keypoints"]
                k[..., 0] = w - k[..., 0]
                if self.flip_idx is not None and len(k):
                    k = k[:, np.asarray(self.flip_idx, int)]
                labels["keypoints"] = np.ascontiguousarray(k)
        else:
            labels["img"] = np.ascontiguousarray(img[::-1])
            if len(boxes):
                boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
            if labels.get("segments"):
                for seg in labels["segments"]:
                    seg[:, 1] = h - seg[:, 1]
            if labels.get("keypoints") is not None:
                labels["keypoints"][..., 1] = h - labels["keypoints"][..., 1]
        labels["bboxes"] = boxes
        return labels


class LetterBoxT:
    """LetterBox as a pipeline transform, updating boxes (reference augment.py:1486)."""

    def __init__(self, new_shape=(640, 640), scaleup=True, center=True):
        self.new_shape = new_shape if isinstance(new_shape, (tuple, list)) else (new_shape, new_shape)
        self.scaleup = scaleup
        self.center = center

    def __call__(self, labels):
        new_shape = labels.pop("rect_shape", None) or self.new_shape
        img, r, (dw, dh) = letterbox_np(labels["img"], new_shape, center=self.center, scaleup=self.scaleup)
        labels["img"] = img
        if len(labels["bboxes"]):
            b = labels["bboxes"] * r
            b[:, [0, 2]] += dw
            b[:, [1, 3]] += dh
            labels["bboxes"] = b
        if labels.get("keypoints") is not None:
            k = labels["keypoints"]
            k[..., 0] = k[..., 0] * r + dw
            k[..., 1] = k[..., 1] * r + dh
        if labels.get("segments"):
            labels["segments"] = [s * r + np.array([dw, dh], np.float32) for s in labels["segments"]]
        labels["ratio_pad"] = (r, (dw, dh))
        return labels


class StretchResizeT:
    """Square stretch-resize (no padding) — RT-DETR val preprocessing
    (reference rtdetr/val.py:30-43: raw resize to imgsz x imgsz, boxes scale
    per-axis; ratio_pad None signals native-space rescale by ori/imgsz)."""

    def __init__(self, new_shape=(640, 640)):
        self.new_shape = new_shape if isinstance(new_shape, (tuple, list)) else (new_shape, new_shape)

    def __call__(self, labels):
        import cv2

        img = labels["img"]
        h0, w0 = img.shape[:2]
        nh, nw = self.new_shape
        labels["img"] = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if len(labels["bboxes"]):
            b = labels["bboxes"].astype(np.float32).copy()
            b[:, [0, 2]] *= nw / w0
            b[:, [1, 3]] *= nh / h0
            labels["bboxes"] = b
        if labels.get("keypoints") is not None:
            k = labels["keypoints"]
            k[..., 0] = k[..., 0] * (nw / w0)
            k[..., 1] = k[..., 1] * (nh / h0)
        labels["ratio_pad"] = None  # per-axis stretch: rescale via ori/imgsz
        return labels


class BGRChannel:
    """RGB<->BGR swap with probability p (reference `bgr` hyp)."""

    def __init__(self, p=0.0):
        self.p = p

    def __call__(self, labels):
        if _rng().random() < self.p:
            labels["img"] = np.ascontiguousarray(labels["img"][..., ::-1])
        return labels


def clip_sample(labels, shape):
    """Clip boxes/segments/keypoints to (h, w) and drop empty boxes (keeping all
    instance-aligned arrays in sync)."""
    h, w = shape
    b = labels["bboxes"]
    if len(b):
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        keep = (b[:, 2] - b[:, 0] > 1e-3) & (b[:, 3] - b[:, 1] > 1e-3)
        labels["bboxes"] = b[keep]
        labels["cls"] = labels["cls"][keep]
        if labels.get("keypoints") is not None:
            labels["keypoints"] = labels["keypoints"][keep]
        if labels.get("segments") and len(labels["segments"]) == len(keep):
            for seg in labels["segments"]:
                seg[:, 0] = seg[:, 0].clip(0, w)
                seg[:, 1] = seg[:, 1].clip(0, h)
            labels["segments"] = [s for s, k in zip(labels["segments"], keep) if k]
    return labels


def v8_transforms(dataset, imgsz: int, hyp, stretch: bool = False):
    """Training transform pipeline factory (reference augment.py:2287)."""
    mosaic = Mosaic(dataset, imgsz=imgsz, p=hyp.mosaic)
    affine = RandomPerspective(
        degrees=hyp.degrees,
        translate=hyp.translate,
        scale=hyp.scale,
        shear=hyp.shear,
        perspective=hyp.perspective,
        pre_transform=None if stretch else LetterBoxT((imgsz, imgsz)),
    )
    flip_idx = getattr(dataset, "flip_idx", None)
    return Compose(
        [
            mosaic,
            CopyPaste(p=hyp.copy_paste),
            affine,
            MixUp(dataset, pre_transform=Compose([mosaic, CopyPaste(p=hyp.copy_paste), affine]), p=hyp.mixup),
            RandomHSV(hgain=hyp.hsv_h, sgain=hyp.hsv_s, vgain=hyp.hsv_v),
            BGRChannel(p=getattr(hyp, "bgr", 0.0)),
            RandomFlip(p=hyp.flipud, direction="vertical"),
            RandomFlip(p=hyp.fliplr, direction="horizontal", flip_idx=flip_idx),
        ]
    )
