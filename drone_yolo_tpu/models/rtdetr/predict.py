"""RT-DETR predictor (reference models/rtdetr/predict.py): NMS-free."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.models.rtdetr.val import rtdetr_dets
from drone_yolo_tpu.nn import modules as M


class RTDETRPredictor(BasePredictor):
    def _forward_fn(self, shape):
        key = ("rtdetr", shape)
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, max_det = float(self.args.conf), int(self.args.max_det)
        nc = self.model.nc
        model = self.model
        imgsz = shape[1]
        dtype = self.dtype

        @jax.jit
        def fn(variables, x):
            preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            return rtdetr_dets(preds, nc, conf, max_det, imgsz)

        self._jit_cache[key] = fn
        return fn
