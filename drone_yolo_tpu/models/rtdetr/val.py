"""RT-DETR validator (reference models/rtdetr/val.py): no NMS — queries ARE the
detections; normalized cxcywh outputs are scaled to input pixels then matched."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.engine.validator import BaseValidator
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.ops.boxes import xywh2xyxy


def rtdetr_dets(preds, nc: int, conf: float, max_det: int, imgsz: int):
    """(B, Q, 4+nc) normalized -> (B, max_det, 6) pixel xyxy dets + counts."""
    boxes = xywh2xyxy(preds[..., :4]) * imgsz
    scores = preds[..., 4:]
    b, q, _ = scores.shape
    k = min(max_det, q * nc)
    flat = scores.reshape(b, -1)
    top, idx = jax.lax.top_k(flat, k)
    qidx = idx // nc
    cidx = (idx % nc).astype(jnp.float32)
    sel = jnp.take_along_axis(boxes, qidx[..., None], axis=1)
    dets = jnp.concatenate([sel, top[..., None], cidx[..., None]], axis=-1)
    valid = top > conf
    dets = dets * valid[..., None].astype(dets.dtype)
    return dets, jnp.sum(valid.astype(jnp.int32), axis=-1)


class RTDETRValidator(BaseValidator):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.args.task = "rtdetr"

    def _forward(self, shape):
        key = ("rtdetr", tuple(shape))
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, max_det = float(self.args.conf), int(self.args.max_det)
        nc = self.nc
        model = self.model
        imgsz = shape[1]
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        @jax.jit
        def fn(variables, x):
            preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            return rtdetr_dets(preds, nc, conf, max_det, imgsz)

        self._jit_cache[key] = fn
        return fn
