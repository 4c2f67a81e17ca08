"""TPU-native ops: box geometry, IoU family, NMS, letterbox math, anchors."""

from drone_yolo_tpu.ops.boxes import (
    bbox_iou,
    box_iou,
    ltwh2xywh,
    ltwh2xyxy,
    xywh2ltwh,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxy2xywhn,
    clip_boxes,
    scale_boxes,
)
from drone_yolo_tpu.ops.nms import non_max_suppression
from drone_yolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors

__all__ = [
    "bbox_iou", "box_iou", "ltwh2xywh", "ltwh2xyxy", "xywh2ltwh", "xywh2xyxy",
    "xywhn2xyxy", "xyxy2ltwh", "xyxy2xywh", "xyxy2xywhn", "clip_boxes", "scale_boxes",
    "non_max_suppression", "bbox2dist", "dist2bbox", "make_anchors",
]
