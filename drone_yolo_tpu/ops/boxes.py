"""Box format conversions and the IoU family as pure jnp functions.

Capability parity with reference `ultralytics/utils/ops.py:412-633` (conversions)
and `ultralytics/utils/metrics.py:52-250` (box_iou / bbox_iou GIoU/DIoU/CIoU /
probiou). Everything here is shape-polymorphic pure math: works on jnp or numpy
arrays, traces cleanly under jit, and broadcasts over leading batch dims.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Format conversions. Boxes are (..., 4) arrays.
# ---------------------------------------------------------------------------
def xyxy2xywh(x):
    """(x1,y1,x2,y2) -> (cx,cy,w,h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(x):
    """(cx,cy,w,h) -> (x1,y1,x2,y2)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xywhn2xyxy(x, w: float = 640.0, h: float = 640.0, padw: float = 0.0, padh: float = 0.0):
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2) with optional pad offset."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w: float = 640.0, h: float = 640.0, clip: bool = False, eps: float = 0.0):
    """Pixel (x1,y1,x2,y2) -> normalized (cx,cy,w,h)."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / (2 * w), (y1 + y2) / (2 * h), (x2 - x1) / w, (y2 - y1) / h], axis=-1
    )


def xywh2ltwh(x):
    """(cx,cy,w,h) -> (left,top,w,h)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=-1)


def xyxy2ltwh(x):
    """(x1,y1,x2,y2) -> (left,top,w,h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def ltwh2xywh(x):
    """(left,top,w,h) -> (cx,cy,w,h)."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l + w / 2, t + h / 2, w, h], axis=-1)


def ltwh2xyxy(x):
    """(left,top,w,h) -> (x1,y1,x2,y2)."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape[0], shape[1]
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True):
    """Rescale xyxy boxes from the letterboxed `img1_shape` back to `img0_shape`.

    Mirrors reference `ultralytics/utils/ops.py:92` (scale_boxes): undo pad, then
    divide by gain, then clip to the original image.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]
    if padding:
        boxes = boxes - jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


# ---------------------------------------------------------------------------
# IoU family
# ---------------------------------------------------------------------------
def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU of two xyxy box sets: (N,4) x (M,4) -> (N,M).

    Reference: `ultralytics/utils/metrics.py:52`.
    """
    a1 = box1[..., :, None, :2]  # (N,1,2)
    a2 = box1[..., :, None, 2:4]
    b1 = box2[..., None, :, :2]  # (1,M,2)
    b2 = box2[..., None, :, 2:4]
    inter = jnp.prod(jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None), axis=-1)
    area1 = jnp.prod(box1[..., :, None, 2:4] - box1[..., :, None, :2], axis=-1)
    area2 = jnp.prod(box2[..., None, :, 2:4] - box2[..., None, :, :2], axis=-1)
    return inter / (area1 + area2 - inter + eps)


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False, CIoU: bool = False, eps: float = 1e-7):
    """Elementwise IoU / GIoU / DIoU / CIoU of broadcastable box arrays (..., 4).

    Reference semantics: `ultralytics/utils/metrics.py:74` (bbox_iou). CIoU adds the
    center-distance and aspect-ratio penalty terms of Zheng et al. 2019.
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
        b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
        b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) * jnp.clip(
        jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None
    )
    if xywh:
        union = w1 * h1 + w2 * h2 - inter + eps
    else:
        union = w1 * (b1y2 - b1y1) + w2 * (b2y2 - b2y1) - inter + eps
    iou = inter / union

    if not (GIoU or DIoU or CIoU):
        return jnp.squeeze(iou, axis=-1)

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # enclosing width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # enclosing height
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps  # enclosing diagonal squared
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi**2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
            # alpha is treated as a constant wrt gradients (reference computes it under no_grad)
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return jnp.squeeze(iou - (rho2 / c2 + v * alpha), axis=-1)
        return jnp.squeeze(iou - rho2 / c2, axis=-1)
    c_area = cw * ch + eps
    return jnp.squeeze(iou - (c_area - union) / c_area, axis=-1)


def probiou(obb1, obb2, CIoU: bool = False, eps: float = 1e-7):
    """Gaussian-Bhattacharyya probabilistic IoU for rotated boxes (cx,cy,w,h,angle).

    Reference: `ultralytics/utils/metrics.py:198`.
    """
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _get_covariance_matrix(obb1)
    a2, b2, c2 = _get_covariance_matrix(obb2)

    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.5
    t3 = jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0, None) * jnp.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    ) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def _get_covariance_matrix(boxes):
    """Covariance terms (a, b, c) of rotated boxes (cx,cy,w,h,angle)."""
    gbbs = jnp.concatenate([boxes[..., 2:4] ** 2 / 12, boxes[..., 4:5]], axis=-1)
    a, b, c = gbbs[..., 0], gbbs[..., 1], gbbs[..., 2]
    cos, sin = jnp.cos(c), jnp.sin(c)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin
