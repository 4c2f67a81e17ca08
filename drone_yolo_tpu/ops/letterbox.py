"""Letterbox preprocessing: aspect-preserving resize + pad to a static shape.

Reference semantics: `ultralytics/data/augment.py:1486` (LetterBox). Two
implementations:
* `letterbox_np`: host-side cv2/numpy for the data pipeline (reference-equivalent).
* `letterbox_device`: jit-able resize+pad for on-device preprocessing of batched
  uint8 frames (video/serving path) — keeps the host out of the hot loop.
"""

from __future__ import annotations

import numpy as np


def letterbox_params(shape, new_shape=(640, 640), center: bool = True, scaleup: bool = True, stride: int = 32, auto: bool = False):
    """Compute (ratio, (pad_w, pad_h), (out_h, out_w)) for an input (h, w)."""
    h, w = shape
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(w * r), round(h * r))  # (w, h)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    if center:
        dw, dh = dw / 2, dh / 2
    return r, (dw, dh), new_unpad


def letterbox_np(img: np.ndarray, new_shape=(640, 640), color=(114, 114, 114), center: bool = True, scaleup: bool = True, auto: bool = False, stride: int = 32):
    """Letterbox an HWC uint8 image on host (cv2). Returns (img, ratio, (dw, dh))."""
    import cv2

    shape = img.shape[:2]
    r, (dw, dh), new_unpad = letterbox_params(shape, new_shape, center, scaleup, stride, auto)
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return img, r, (dw, dh)


def letterbox_device(img, new_shape=(640, 640), pad_value: float = 114.0 / 255.0):
    """Device-side letterbox of a batched float image (B, H, W, C) in [0, 1].

    Shapes are static, so ratio/pad are Python constants folded at trace time;
    the resize lowers to an XLA gather/linear-interp fused with the /255 cast.
    """
    import jax
    import jax.numpy as jnp

    b, h, w, c = img.shape
    r, (dw, dh), (nw, nh) = letterbox_params((h, w), new_shape)
    resized = jax.image.resize(img, (b, nh, nw, c), method="linear")
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    out = jnp.full((b, new_shape[0], new_shape[1], c), pad_value, img.dtype)
    return jax.lax.dynamic_update_slice(out, resized, (0, top, left, 0)), r, (dw, dh)
