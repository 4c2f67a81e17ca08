"""Coordinate/segment/mask conversion utilities completing the reference's
public ops surface (ultralytics/utils/ops.py) — numpy host-side helpers used
around the device compute path. Each function mirrors the reference semantics
exactly (file:line cited per function); torch-tensor handling is dropped
(numpy is the host currency here).
"""

from __future__ import annotations

import math
import re

import numpy as np

__all__ = [
    "segment2box",
    "segments2boxes",
    "resample_segments",
    "masks2segments",
    "merge_multi_segment",
    "regularize_rboxes",
    "xyxyxyxy2xywhr",
    "xywhr2xyxyxyxy",
    "scale_image",
    "clip_coords",
    "scale_coords",
    "process_mask_native",
    "clean_str",
]


def segment2box(segment, width: int = 640, height: int = 640):
    """One polygon -> xyxy box with inside-image constraint (reference ops.py:336)."""
    segment = np.asarray(segment, np.float32)
    x, y = segment.T
    # if 3+ sides are exceeded, clip first (reference PR #18294 behavior);
    # int casts: np.bool_ addition is logical-or, not counting
    if int(x.min() < 0) + int(y.min() < 0) + int(x.max() > width) + int(y.max() > height) >= 3:
        x = x.clip(0, width)
        y = y.clip(0, height)
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    return (
        np.array([x.min(), y.min(), x.max(), y.max()], dtype=segment.dtype)
        if len(x)
        else np.zeros(4, dtype=segment.dtype)
    )


def segments2boxes(segments):
    """List of (n, 2) polygons -> (N, 4) xywh boxes (reference ops.py:617)."""
    from drone_yolo_tpu.ops.boxes import xyxy2xywh

    boxes = []
    for s in segments:
        s = np.asarray(s, np.float32)
        if len(s):
            x, y = s.T
            boxes.append([x.min(), y.min(), x.max(), y.max()])
        else:
            boxes.append([0.0, 0.0, 0.0, 0.0])
    return xyxy2xywh(np.asarray(boxes, np.float32))


def resample_segments(segments, n: int = 1000):
    """Up-sample each (m, 2) polygon to n points by linear interpolation,
    keeping original vertices when m < n (reference ops.py:636)."""
    out = list(segments)
    for i, s in enumerate(out):
        s = np.asarray(s, np.float32)
        if len(s) == n:
            continue
        s = np.concatenate((s, s[0:1, :]), axis=0)
        x = np.linspace(0, len(s) - 1, n - len(s) if len(s) < n else n)
        xp = np.arange(len(s))
        if len(s) < n:
            x = np.insert(x, np.searchsorted(x, xp), xp)
        out[i] = np.concatenate([np.interp(x, xp, s[:, j]) for j in range(2)], dtype=np.float32).reshape(2, -1).T
    return out


def min_index(arr1, arr2):
    """Index pair with min pairwise distance between two point sets (reference converter.py:517)."""
    dis = ((arr1[:, None, :] - arr2[None, :, :]) ** 2).sum(-1)
    return np.unravel_index(np.argmin(dis, axis=None), dis.shape)


def merge_multi_segment(segments):
    """Connect multiple polygons into one via min-distance bridges (reference
    data/converter.py:532)."""
    s = []
    segments = [np.asarray(i, np.float32).reshape(-1, 2) for i in segments]
    idx_list = [[] for _ in range(len(segments))]
    for i in range(1, len(segments)):
        idx1, idx2 = min_index(segments[i - 1], segments[i])
        idx_list[i - 1].append(idx1)
        idx_list[i].append(idx2)
    for k in range(2):
        if k == 0:
            for i, idx in enumerate(idx_list):
                if len(idx) == 2 and idx[0] > idx[1]:
                    idx = idx[::-1]
                    segments[i] = segments[i][::-1, :]
                segments[i] = np.roll(segments[i], -idx[0], axis=0)
                segments[i] = np.concatenate([segments[i], segments[i][:1]])
                if i in {0, len(idx_list) - 1}:
                    s.append(segments[i])
                else:
                    idx = [0, idx[1] - idx[0]]
                    s.append(segments[i][idx[0] : idx[1] + 1])
        else:
            for i in range(len(idx_list) - 1, -1, -1):
                if i not in {0, len(idx_list) - 1}:
                    idx = idx_list[i]
                    nidx = abs(idx[1] - idx[0])
                    s.append(segments[i][nidx:])
    return s


def masks2segments(masks, strategy: str = "all"):
    """Binary masks (n, h, w) -> list of (m, 2) polygons via external contours
    (reference ops.py:810); 'all' merges multi-contour masks, 'largest' keeps
    the biggest contour."""
    import cv2

    segments = []
    for x in np.asarray(masks).astype(np.uint8):
        c = cv2.findContours(x, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if c:
            if strategy == "all":
                c = np.concatenate(merge_multi_segment([p.reshape(-1, 2) for p in c])) if len(c) > 1 else c[0].reshape(-1, 2)
            elif strategy == "largest":
                c = np.array(c[np.array([len(p) for p in c]).argmax()]).reshape(-1, 2)
        else:
            c = np.zeros((0, 2))
        segments.append(c.astype(np.float32))
    return segments


def regularize_rboxes(rboxes):
    """Canonicalize xywhr boxes to angle in [0, pi/2) (reference ops.py:791)."""
    rboxes = np.asarray(rboxes, np.float32)
    x, y, w, h, t = (rboxes[..., i] for i in range(5))
    swap = (t % math.pi) >= (math.pi / 2)
    w_ = np.where(swap, h, w)
    h_ = np.where(swap, w, h)
    t = t % (math.pi / 2)
    return np.stack([x, y, w_, h_, t], axis=-1)


def xyxyxyxy2xywhr(x):
    """(n, 8) corner boxes -> (n, 5) xywhr via cv2.minAreaRect, radians
    (reference ops.py:549)."""
    import cv2

    points = np.asarray(x, np.float32).reshape(len(x), -1, 2)
    rboxes = []
    for pts in points:
        (cx, cy), (w, h), angle = cv2.minAreaRect(pts)
        rboxes.append([cx, cy, w, h, angle / 180 * np.pi])
    return np.asarray(rboxes, np.float32)


def xywhr2xyxyxyxy(x):
    """(..., 5) xywhr -> (..., 4, 2) corner points (reference ops.py:572)."""
    x = np.asarray(x, np.float32)
    ctr = x[..., :2]
    w, h, angle = (x[..., i : i + 1] for i in range(2, 5))
    cos_v, sin_v = np.cos(angle), np.sin(angle)
    vec1 = np.concatenate([w / 2 * cos_v, w / 2 * sin_v], -1)
    vec2 = np.concatenate([-h / 2 * sin_v, h / 2 * cos_v], -1)
    pt1 = ctr + vec1 + vec2
    pt2 = ctr + vec1 - vec2
    pt3 = ctr - vec1 - vec2
    pt4 = ctr - vec1 + vec2
    return np.stack([pt1, pt2, pt3, pt4], axis=-2)


def scale_image(masks, im0_shape, ratio_pad=None):
    """Un-letterbox an HWC image/mask stack to the original shape
    (reference ops.py:377)."""
    import cv2

    im1_shape = masks.shape
    if im1_shape[:2] == tuple(im0_shape[:2]):
        return masks
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = (im1_shape[1] - im0_shape[1] * gain) / 2, (im1_shape[0] - im0_shape[0] * gain) / 2
    else:
        pad = ratio_pad[1]
    top, left = int(pad[1]), int(pad[0])
    bottom, right = int(im1_shape[0] - pad[1]), int(im1_shape[1] - pad[0])
    if masks.ndim < 2:
        raise ValueError(f"masks must be 2-D or 3-D, got {masks.ndim}-D")
    masks = masks[top:bottom, left:right]
    masks = cv2.resize(masks, (im0_shape[1], im0_shape[0]))
    if masks.ndim == 2:
        masks = masks[:, :, None]
    return masks


def clip_coords(coords, shape):
    """Clip (..., 2) xy coordinates to image bounds (reference ops.py:346)."""
    coords = np.asarray(coords, np.float32)
    coords[..., 0] = coords[..., 0].clip(0, shape[1])
    coords[..., 1] = coords[..., 1].clip(0, shape[0])
    return coords


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None, normalize: bool = False, padding: bool = True):
    """Rescale (..., 2) xy coords from letterboxed to original space
    (reference ops.py:756)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (img1_shape[1] - img0_shape[1] * gain) / 2, (img1_shape[0] - img0_shape[0] * gain) / 2
    else:
        gain = ratio_pad[0][0] if np.ndim(ratio_pad[0]) else ratio_pad[0]
        pad = ratio_pad[1]
    coords = np.asarray(coords, np.float32).copy()
    if padding:
        coords[..., 0] -= pad[0]
        coords[..., 1] -= pad[1]
    coords[..., 0] /= gain
    coords[..., 1] /= gain
    coords = clip_coords(coords, img0_shape)
    if normalize:
        coords[..., 0] /= img0_shape[1]
        coords[..., 1] /= img0_shape[0]
    return coords


def process_mask_native(protos, coeffs, boxes, shape):
    """Upsample protos to input size FIRST, then crop to boxes — the
    more-accurate mask path the reference uses for save_json/save_txt
    (reference ops.py:712). protos (Hm, Wm, nm) NHWC-style; returns
    (N, H, W) float masks in [0, 1]."""
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.ops.masks import crop_mask

    hm, wm, nm = protos.shape
    ih, iw = shape
    masks = jax.nn.sigmoid(jnp.asarray(coeffs) @ jnp.asarray(protos).reshape(-1, nm).T).reshape(-1, hm, wm)
    masks = jax.image.resize(masks, (masks.shape[0], ih, iw), method="bilinear")
    return crop_mask(masks, jnp.asarray(boxes))


def clean_str(s: str) -> str:
    """Replace special characters with '_' (reference ops.py:854)."""
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)
