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
    """(B, Q, 4+nc) normalized -> (B, max_det, 6) pixel xyxy dets + counts.

    Reference-exact (rtdetr/val.py:95-114): best class per query (`scores.max(-1)`,
    NOT multi-label), sorted by confidence descending, conf-gated (the reference
    comments the gate out for val but runs conf=0.001 — equivalent since sigmoid
    scores below 1e-3 contribute nothing to mAP; the predictor applies it)."""
    boxes = xywh2xyxy(preds[..., :4]) * imgsz
    scores = preds[..., 4:]
    b, q, _ = scores.shape
    score = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)
    k = min(max_det, q)
    top, qidx = jax.lax.top_k(score, k)
    sel = jnp.take_along_axis(boxes, qidx[..., None], axis=1)
    cidx = jnp.take_along_axis(cls, qidx, axis=1)
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
        from drone_yolo_tpu.utils.checks import resolve_dtype as _rd; dtype = _rd(self.args.half)

        @jax.jit
        def fn(variables, x):
            preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            return rtdetr_dets(preds, nc, conf, max_det, imgsz)

        self._jit_cache[key] = fn
        return fn

    def update_metrics(self, dets, n_valid, batch, in_shape):
        """Stretch-mode rescale: preds and GT scale per-axis by ori/imgsz
        (reference rtdetr/val.py:116-140 _prepare_batch/_prepare_pred — no
        letterbox pad to undo)."""
        import numpy as np

        from drone_yolo_tpu.utils.metrics import box_iou_np, match_predictions

        dets = np.asarray(dets)
        ih, iw = int(in_shape[0]), int(in_shape[1])
        for i in range(len(dets)):
            self.seen += 1
            d = dets[i, : int(n_valid[i])].copy()
            gt_mask = batch["mask"][i].astype(bool)
            gt = batch["bboxes"][i][gt_mask].copy()  # stretched pixel xyxy
            gt_cls = batch["cls"][i][gt_mask]
            oh, ow = batch["ori_shapes"][i]
            if len(d):
                d[:, [0, 2]] *= ow / iw
                d[:, [1, 3]] *= oh / ih
            if len(gt):
                gt[:, [0, 2]] *= ow / iw
                gt[:, [1, 3]] *= oh / ih
            iou = box_iou_np(gt, d[:, :4]) if len(d) and len(gt) else np.zeros((len(gt), len(d)))
            tp = match_predictions(d[:, 5].astype(int), gt_cls.astype(int), iou, self.iouv)
            self.stats["tp"].append(tp)
            self.stats["conf"].append(d[:, 4])
            self.stats["pred_cls"].append(d[:, 5])
            self.stats["target_cls"].append(gt_cls)
