"""Vectorized box/segment/keypoint containers.

Capability parity with `ultralytics/utils/instance.py:34-429` (Bboxes,
Instances): format-aware box storage with scale/clip/flip operations over the
joint (boxes, segments, keypoints) instance set. The internal augment pipeline
uses plain arrays for speed; these classes are the user-facing API parity layer.
"""

from __future__ import annotations

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


def _convert(boxes, src, dst):
    from drone_yolo_tpu.ops.boxes import ltwh2xywh, ltwh2xyxy, xywh2ltwh, xywh2xyxy, xyxy2ltwh, xyxy2xywh

    if src == dst:
        return boxes
    table = {
        ("xyxy", "xywh"): xyxy2xywh,
        ("xyxy", "ltwh"): xyxy2ltwh,
        ("xywh", "xyxy"): xywh2xyxy,
        ("xywh", "ltwh"): xywh2ltwh,
        ("ltwh", "xyxy"): ltwh2xyxy,
        ("ltwh", "xywh"): ltwh2xywh,
    }
    return np.asarray(table[(src, dst)](boxes))


class Bboxes:
    """Format-aware box container (reference instance.py:34)."""

    def __init__(self, bboxes, format: str = "xyxy"):
        assert format in _FORMATS
        bboxes = np.asarray(bboxes, np.float32)
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        self.bboxes = _convert(self.bboxes, self.format, format)
        self.format = format

    def areas(self):
        b = _convert(self.bboxes, self.format, "xyxy")
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def mul(self, scale):
        if isinstance(scale, (int, float)):
            scale = (scale,) * 4
        self.bboxes = self.bboxes * np.asarray(scale, np.float32)

    def add(self, offset):
        if isinstance(offset, (int, float)):
            offset = (offset,) * 4
        self.bboxes = self.bboxes + np.asarray(offset, np.float32)

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, idx):
        b = self.bboxes[idx]
        return Bboxes(b.reshape(-1, 4), self.format)

    @classmethod
    def concatenate(cls, boxes_list, axis=0):
        assert boxes_list
        fmt = boxes_list[0].format
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis=axis), fmt)


class Instances:
    """Joint container: boxes + segments + keypoints (reference instance.py:185)."""

    def __init__(self, bboxes, segments=None, keypoints=None, bbox_format="xywh", normalized=True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.keypoints = keypoints
        self.normalized = normalized
        self.segments = segments if segments is not None else []

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format):
        self._bboxes.convert(format)

    def scale(self, scale_w, scale_h, bbox_only=False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if bbox_only:
            return
        for s in self.segments:
            s[..., 0] *= scale_w
            s[..., 1] *= scale_h
        if self.keypoints is not None:
            self.keypoints[..., 0] *= scale_w
            self.keypoints[..., 1] *= scale_h

    def denormalize(self, w, h):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w, h):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw, padh):
        assert not self.normalized, "denormalize before padding"
        self._bboxes.add((padw, padh, padw, padh))
        for s in self.segments:
            s[..., 0] += padw
            s[..., 1] += padh
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h):
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        b[:, [1, 3]] = h - b[:, [3, 1]]
        for s in self.segments:
            s[..., 1] = h - s[..., 1]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w):
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        b[:, [0, 2]] = w - b[:, [2, 0]]
        for s in self.segments:
            s[..., 0] = w - s[..., 0]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)
        for s in self.segments:
            s[..., 0] = s[..., 0].clip(0, w)
            s[..., 1] = s[..., 1].clip(0, h)
        if self.keypoints is not None:
            self.keypoints[..., 0] = self.keypoints[..., 0].clip(0, w)
            self.keypoints[..., 1] = self.keypoints[..., 1].clip(0, h)

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            if self.segments:
                self.segments = [s for s, g in zip(self.segments, good) if g]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def update(self, bboxes, segments=None, keypoints=None):
        self._bboxes = Bboxes(bboxes, self._bboxes.format)
        if segments is not None:
            self.segments = segments
        if keypoints is not None:
            self.keypoints = keypoints

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, idx):
        segments = [self.segments[i] for i in np.atleast_1d(np.arange(len(self.segments))[idx])] if self.segments else []
        kpts = self.keypoints[idx] if self.keypoints is not None else None
        return Instances(self.bboxes[idx].reshape(-1, 4), segments, kpts, self._bboxes.format, self.normalized)
