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
from drone_yolo_tpu.ops.nms import nms_rotated, non_max_suppression
from drone_yolo_tpu.ops.anchors import bbox2dist, dist2bbox, dist2rbox, make_anchors
from drone_yolo_tpu.ops.letterbox import letterbox_device, letterbox_np
from drone_yolo_tpu.ops.masks import crop_mask, mask_iou_np, process_mask, scale_masks_np
from drone_yolo_tpu.ops.tiling import get_windows, tiled_inference
from drone_yolo_tpu.ops.convert import (
    clean_str,
    clip_coords,
    masks2segments,
    merge_multi_segment,
    process_mask_native,
    regularize_rboxes,
    resample_segments,
    scale_coords,
    scale_image,
    segment2box,
    segments2boxes,
    xywhr2xyxyxyxy,
    xyxyxyxy2xywhr,
)

__all__ = [
    "bbox_iou", "box_iou", "ltwh2xywh", "ltwh2xyxy", "xywh2ltwh", "xywh2xyxy",
    "xywhn2xyxy", "xyxy2ltwh", "xyxy2xywh", "xyxy2xywhn", "clip_boxes", "scale_boxes",
    "non_max_suppression", "nms_rotated", "bbox2dist", "dist2bbox", "dist2rbox",
    "make_anchors", "letterbox_np", "letterbox_device", "crop_mask", "process_mask",
    "scale_masks_np", "mask_iou_np", "get_windows", "tiled_inference",
    "segment2box", "segments2boxes", "resample_segments", "masks2segments",
    "merge_multi_segment", "regularize_rboxes", "xyxyxyxy2xywhr", "xywhr2xyxyxyxy",
    "scale_image", "clip_coords", "scale_coords", "process_mask_native", "clean_str",
]
