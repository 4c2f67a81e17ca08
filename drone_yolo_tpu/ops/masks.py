"""Mask ops for segmentation: prototype combination, cropping, upsampling.

Capability parity with `ultralytics/utils/ops.py:660-760` (crop_mask,
process_mask, process_mask_native, scale_masks). Pure jnp, static shapes:
masks are (N, H, W) sigmoid(coeff @ protos), cropped to their boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks, boxes):
    """Zero mask pixels outside each box. masks (N, H, W); boxes (N, 4) xyxy in mask pixels."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (N,1,1)
    c = jnp.arange(w, dtype=boxes.dtype)[None, None, :]  # (1,1,W)
    r = jnp.arange(h, dtype=boxes.dtype)[None, :, None]  # (1,H,1)
    keep = (c >= x1) & (c < x2) & (r >= y1) & (r < y2)
    return masks * keep


def process_mask(protos, coeffs, boxes, img_shape, upsample: bool = False):
    """Combine prototypes with per-detection coefficients and crop to boxes.

    Args:
        protos: (Hm, Wm, nm) prototype maps (head output for one image).
        coeffs: (N, nm) mask coefficients per detection.
        boxes: (N, 4) xyxy in network-input pixels.
        img_shape: (H, W) network input size.

    Returns (N, Hm, Wm) float masks in [0,1] (or (N, H, W) if upsample).
    """
    hm, wm, nm = protos.shape
    ih, iw = img_shape
    masks = jax.nn.sigmoid(coeffs @ protos.reshape(-1, nm).T).reshape(-1, hm, wm)
    scale = jnp.asarray([wm / iw, hm / ih, wm / iw, hm / ih], boxes.dtype)
    masks = crop_mask(masks, boxes * scale)
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), method="bilinear")
    return masks


def scale_masks_np(masks, orig_shape, in_shape, ratio_pad=None):
    """Host-side: un-letterbox masks to original image size (reference ops.py:736).

    masks: (N, Hm, Wm) numpy in mask space aligned to the letterboxed input.
    """
    import cv2
    import numpy as np

    n = len(masks)
    if n == 0:
        return np.zeros((0, *orig_shape), np.float32)
    ih, iw = in_shape
    if ratio_pad is None:
        gain = min(ih / orig_shape[0], iw / orig_shape[1])
        pad_w = (iw - orig_shape[1] * gain) / 2
        pad_h = (ih - orig_shape[0] * gain) / 2
    else:
        gain = ratio_pad[0]
        pad_w, pad_h = ratio_pad[1]
    hm, wm = masks.shape[1:]
    sx, sy = wm / iw, hm / ih
    top, left = int(round(pad_h * sy - 0.1)), int(round(pad_w * sx - 0.1))
    bottom, right = int(round((ih - pad_h) * sy + 0.1)), int(round((iw - pad_w) * sx + 0.1))
    out = np.empty((n, *orig_shape), np.float32)
    for i, m in enumerate(np.asarray(masks, np.float32)):
        crop = m[top:bottom, left:right]
        out[i] = cv2.resize(crop, (orig_shape[1], orig_shape[0]), interpolation=cv2.INTER_LINEAR)
    return out


def mask_iou_np(masks1, masks2, eps: float = 1e-7):
    """Pairwise IoU of binary masks: (N, HW) x (M, HW) -> (N, M), numpy."""
    import numpy as np

    m1 = np.asarray(masks1, np.float32).reshape(len(masks1), -1)
    m2 = np.asarray(masks2, np.float32).reshape(len(masks2), -1)
    inter = m1 @ m2.T
    union = m1.sum(1)[:, None] + m2.sum(1)[None, :] - inter
    return inter / (union + eps)
