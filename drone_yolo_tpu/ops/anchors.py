"""Anchor-free grid anchors and distance<->box transforms.

Reference semantics: `ultralytics/utils/tal.py:333-375` (make_anchors, dist2bbox,
bbox2dist, dist2rbox). On TPU these run at trace time over static feature shapes,
so anchors become compile-time constants folded into the XLA program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5, dtype=np.float32):
    """Build anchor center points and a stride tensor from static feature-map shapes.

    Args:
        feat_shapes: list of (h, w) per detection level.
        strides: list of int strides per level, e.g. [8, 16, 32] or [4, 8, 16, 32].

    Returns:
        anchor_points: (A, 2) numpy array of (x, y) cell centers in stride units.
        stride_tensor: (A, 1) numpy array of per-anchor strides.

    Returned as numpy so jit tracing embeds them as constants (the reference
    recomputes them on shape change at runtime, `head.py:107`; here shapes are
    static per compile so this is free).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = np.arange(w, dtype=dtype) + grid_cell_offset
        sy = np.arange(h, dtype=dtype) + grid_cell_offset
        sy, sx = np.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(np.stack((sx, sy), -1).reshape(-1, 2))
        stride_tensor.append(np.full((h * w, 1), stride, dtype=dtype))
    return np.concatenate(anchor_points), np.concatenate(stride_tensor)


def dist2bbox(distance, anchor_points, xywh: bool = True, axis: int = -1):
    """Transform distance (l, t, r, b) to box (xywh or xyxy)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) * 0.5
        wh = x2y2 - x1y1
        return jnp.concatenate((c_xy, wh), axis=axis)
    return jnp.concatenate((x1y1, x2y2), axis=axis)


def bbox2dist(anchor_points, bbox, reg_max: int):
    """Transform xyxy box to clamped distance (l, t, r, b) targets for DFL."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate((anchor_points - x1y1, x2y2 - anchor_points), axis=-1),
        0,
        reg_max - 0.01,
    )


def dist2rbox(pred_dist, pred_angle, anchor_points, axis: int = -1):
    """Decode rotated box from distance + angle predictions."""
    lt, rb = jnp.split(pred_dist, 2, axis=axis)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) * 0.5, 2, axis=axis)
    x, y = xf * cos - yf * sin, xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=axis)
