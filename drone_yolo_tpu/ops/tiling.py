"""Tiled (SAHI-style) inference over large aerial frames + dataset tiling.

Capability parity with the reference's `data/split_dota.py:97-298` (get_windows,
sliding-window dataset crops) and the author's tiled-inference script
(切块可视化.py). TPU re-design: all crops of one frame form ONE batched forward
(static crop shape -> single compiled program), detections are offset back to
frame coordinates, and a global NMS merges the overlap zones.
"""

from __future__ import annotations

import numpy as np


def get_windows(im_shape, crop_size: int = 640, gap: int = 128, im_rate_thr: float = 0.6):
    """Sliding windows covering (h, w): (N, 4) xyxy (reference split_dota.py:97).

    Windows step by crop_size - gap; edge windows are shifted inside the image.
    """
    h, w = im_shape
    step = crop_size - gap
    assert step > 0, "gap must be smaller than crop_size"

    xs = list(range(0, max(w - gap, 1), step))
    if xs and xs[-1] + crop_size > w:
        xs[-1] = max(w - crop_size, 0)
    ys = list(range(0, max(h - gap, 1), step))
    if ys and ys[-1] + crop_size > h:
        ys[-1] = max(h - crop_size, 0)

    wins = []
    for y in sorted(set(ys)):
        for x in sorted(set(xs)):
            wins.append([x, y, min(x + crop_size, w), min(y + crop_size, h)])
    return np.asarray(wins, dtype=np.int64)


def crop_windows(img: np.ndarray, windows: np.ndarray, crop_size: int, pad_value: int = 114):
    """Extract fixed-size crops (padding bottom/right when a window is clipped)."""
    n = len(windows)
    out = np.full((n, crop_size, crop_size, img.shape[2]), pad_value, dtype=img.dtype)
    for i, (x1, y1, x2, y2) in enumerate(windows):
        out[i, : y2 - y1, : x2 - x1] = img[y1:y2, x1:x2]
    return out


def tiled_inference(
    forward_fn,
    variables,
    img: np.ndarray,
    crop_size: int = 640,
    gap: int = 128,
    max_crop_batch: int = 16,
    conf: float = 0.25,
    iou: float = 0.7,
    max_det: int = 300,
):
    """Run `forward_fn(variables, batch) -> (dets, n_valid)` over tiles and merge.

    Args:
        forward_fn: jitted forward+NMS over (B, crop, crop, 3) float [0,1] inputs
            returning ((B, max_det, 6+), (B,)) per-crop detections.
        img: HWC uint8 RGB frame of arbitrary size.

    Returns (M, 6+) merged detections in frame coordinates.
    """
    windows = get_windows(img.shape[:2], crop_size, gap)
    crops = crop_windows(img, windows, crop_size).astype(np.float32) / 255.0

    all_dets = []
    for s in range(0, len(crops), max_crop_batch):
        batch = crops[s : s + max_crop_batch]
        if len(batch) < max_crop_batch:  # static batch shape: pad with zeros
            batch = np.concatenate([batch, np.zeros((max_crop_batch - len(batch), *batch.shape[1:]), batch.dtype)])
        dets, n_valid = forward_fn(variables, batch)
        dets, n_valid = np.asarray(dets), np.asarray(n_valid)
        for i in range(min(len(crops) - s, max_crop_batch)):
            d = dets[i, : int(n_valid[i])].copy()
            if len(d):
                d[:, [0, 2]] += windows[s + i, 0]
                d[:, [1, 3]] += windows[s + i, 1]
                all_dets.append(d)

    if not all_dets:
        return np.zeros((0, 6), np.float32)
    merged = np.concatenate(all_dets)
    keep = _greedy_nms_np(merged[:, :4] + merged[:, 5:6] * 7680, merged[:, 4], iou)
    merged = merged[keep][:max_det]
    return merged


def _greedy_nms_np(boxes, scores, thr):
    """Host greedy NMS for the (small) cross-tile merge set."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1, yy1 = np.maximum(x1[i], x1), np.maximum(y1[i], y1)
        xx2, yy2 = np.minimum(x2[i], x2), np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou_v = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou_v > thr
    return np.asarray(keep, dtype=int)


def crop_labels(labels_xyxy: np.ndarray, cls: np.ndarray, window, iof_thr: float = 0.7):
    """Clip labels into a window, keeping boxes with intersection-over-foreground
    >= iof_thr (reference split_dota.py get_window_obj semantics)."""
    x1, y1, x2, y2 = window
    if len(labels_xyxy) == 0:
        return labels_xyxy, cls
    ix1 = np.maximum(labels_xyxy[:, 0], x1)
    iy1 = np.maximum(labels_xyxy[:, 1], y1)
    ix2 = np.minimum(labels_xyxy[:, 2], x2)
    iy2 = np.minimum(labels_xyxy[:, 3], y2)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area = (labels_xyxy[:, 2] - labels_xyxy[:, 0]) * (labels_xyxy[:, 3] - labels_xyxy[:, 1])
    keep = inter / (area + 1e-9) >= iof_thr
    out = np.stack([ix1, iy1, ix2, iy2], 1)[keep] - np.array([x1, y1, x1, y1])
    return out.astype(np.float32), cls[keep]
