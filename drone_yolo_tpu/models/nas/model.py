"""NAS facade (reference models/nas/model.py:27-96).

The reference wraps a super-gradients checkpoint: it does NOT implement the
YOLO-NAS architecture, it standardizes an externally-trained model (stride 32,
names, fuse no-op) and routes its (boxes_xyxy, scores) output pair through the
shared NMS stack via NASPredictor/NASValidator. This mirrors that contract for
local checkpoints (zero-egress: no pretrained download; convert offline and
pass a path). Any artifact loadable by our checkpoint/AutoBackend machinery
works; raw outputs may be either the uniform (B, A, 4+nc) tensor or the
NAS-style (boxes_xyxy, scores) pair — the adapters accept both.
"""

from __future__ import annotations

from pathlib import Path

from drone_yolo_tpu.engine.model import YOLO
from drone_yolo_tpu.models.nas.predict import NASPredictor
from drone_yolo_tpu.models.nas.val import NASValidator


def adapt_nas_pair(preds):
    """(boxes_xyxy (B,A,4), scores (B,A,nc)) -> (B, A, 4+nc) xywh+scores
    (reference predict.py:postprocess lines 1-2: xyxy2xywh + cat)."""
    import jax.numpy as jnp

    if isinstance(preds, (tuple, list)) and len(preds) == 2 and preds[0].shape[-1] == 4:
        boxes, scores = preds
        xy = (boxes[..., :2] + boxes[..., 2:4]) / 2.0
        wh = boxes[..., 2:4] - boxes[..., :2]
        return jnp.concatenate([xy, wh, scores], axis=-1)
    return preds


class _NASModelShim:
    """Standardized wrapper over the loaded model (reference model.py:66-82:
    forward override, stride=32, fuse no-op)."""

    def __init__(self, inner):
        self._inner = inner
        self.nc = inner.nc
        self.names = inner.names
        self.stride = [32] if getattr(inner, "stride", None) is None else inner.stride
        self.task = "detect"
        self.yaml = getattr(inner, "yaml", {})
        self.head = getattr(inner, "head", None)

    def fuse(self, variables):  # reference: fuse is a no-op on NAS
        return self._inner.fuse(variables) if hasattr(self._inner, "fuse") else variables

    def apply(self, variables, x, **kw):
        out = self._inner.apply(variables, x, **kw)
        preds = out[0] if isinstance(out, tuple) else out
        return adapt_nas_pair(preds) if isinstance(preds, (tuple, list)) else preds, None

    def __getattr__(self, name):
        return getattr(self._inner, name)


class NAS(YOLO):
    """YOLO-NAS facade: pre-trained checkpoints only (no yaml construction)."""

    def __init__(self, model="yolo_nas_s.npz", task=None, verbose=False):
        assert Path(str(model)).suffix not in {".yaml", ".yml"}, "YOLO-NAS models only support pre-trained checkpoints"
        super().__init__(model, task="detect", verbose=verbose)

    def _load(self, weights: str, task=None):
        super()._load(weights, task="detect")
        self.model = _NASModelShim(self.model)

    @property
    def task_map(self):
        return {"detect": {"predictor": NASPredictor, "validator": NASValidator}}
