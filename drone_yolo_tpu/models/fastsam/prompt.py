"""Prompt-based filtering of everything-mode segmentation results.

Capability parity with `ultralytics/models/fastsam/predict.py` prompt logic:
box prompts keep the max-IoU mask; point prompts keep masks containing the
point (respecting fg/bg labels); text prompts rank masks with CLIP when the
transformers package provides it.
"""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.utils import LOGGER
from drone_yolo_tpu.utils.metrics import box_iou_np


def prompt_results(result, bboxes=None, points=None, labels=None, texts=None):
    """Filter one Results object by prompts; returns a reduced Results."""
    if result.masks is None or len(result.masks) == 0:
        return result
    masks = result.masks.data.astype(bool)  # (N, h, w)
    n, mh, mw = masks.shape
    h, w = result.orig_shape
    keep = np.zeros(n, bool)

    if bboxes is not None:
        bb = np.asarray(bboxes, np.float32).reshape(-1, 4)
        # mask bounding boxes in original pixel space
        mboxes = np.zeros((n, 4), np.float32)
        sx, sy = w / mw, h / mh
        for i, m in enumerate(masks):
            ys, xs = np.nonzero(m)
            if len(xs):
                mboxes[i] = [xs.min() * sx, ys.min() * sy, xs.max() * sx, ys.max() * sy]
        iou = box_iou_np(bb, mboxes)
        keep[np.argmax(iou, axis=1)] = True

    if points is not None:
        pts = np.asarray(points, np.float32).reshape(-1, 2)
        lbl = np.asarray(labels if labels is not None else np.ones(len(pts)), int)
        for p, l in zip(pts, lbl):
            xi, yi = int(p[0] * mw / w), int(p[1] * mh / h)
            inside = masks[:, min(max(yi, 0), mh - 1), min(max(xi, 0), mw - 1)]
            if l == 1:
                keep |= inside
            else:
                keep &= ~inside

    if texts is not None:
        try:
            import torch
            from transformers import CLIPModel, CLIPProcessor

            clip = CLIPModel.from_pretrained("openai/clip-vit-base-patch32")
            proc = CLIPProcessor.from_pretrained("openai/clip-vit-base-patch32")
            crops = []
            import cv2

            for m in masks:
                ys, xs = np.nonzero(m)
                if not len(xs):
                    crops.append(result.orig_img)
                    continue
                x1, y1 = int(xs.min() * w / mw), int(ys.min() * h / mh)
                x2, y2 = int(xs.max() * w / mw), int(ys.max() * h / mh)
                crops.append(result.orig_img[max(y1, 0) : y2 + 1, max(x1, 0) : x2 + 1])
            inputs = proc(text=[texts] if isinstance(texts, str) else list(texts), images=crops, return_tensors="pt", padding=True)
            with torch.no_grad():
                out = clip(**inputs)
            sim = out.logits_per_image.numpy()  # (n_crops, n_texts)
            keep[np.argmax(sim, axis=0)] = True
        except Exception as e:  # noqa: BLE001 - CLIP weights unavailable offline
            LOGGER.warning(f"text prompts require CLIP weights (transformers): {e}")

    idx = np.nonzero(keep)[0]
    return result[idx] if len(idx) else result
