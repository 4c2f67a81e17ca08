"""OBB (oriented bounding box) task triple (reference models/yolo/obb/*)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.engine.results import Results
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.engine.validator import BaseValidator
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.ops.nms import nms_rotated
from drone_yolo_tpu.utils.loss import v8OBBLoss
from drone_yolo_tpu.utils.metrics import OBBMetrics, match_predictions


def _probiou_np(r1, r2, eps=1e-7):
    """Pairwise probiou of rotated boxes (M,5) x (N,5) -> (M,N) in numpy."""
    from drone_yolo_tpu.ops.boxes import probiou

    return np.asarray(probiou(jnp.asarray(r1)[:, None, :], jnp.asarray(r2)[None, :, :]))


def _rboxes_from_segments(segments):
    """4+-point polygons -> (N, 5) xywhr via cv2.minAreaRect."""
    import cv2

    out = np.zeros((len(segments), 5), np.float32)
    for i, seg in enumerate(segments):
        (cx, cy), (w, h), ang = cv2.minAreaRect(np.asarray(seg, np.float32))
        out[i] = [cx, cy, w, h, np.deg2rad(ang)]
    return out


class OBBTrainer(BaseTrainer):
    loss_names = ("box_loss", "cls_loss", "dfl_loss")

    def get_criterion(self):
        return v8OBBLoss(self.model, box=self.args.box, cls=self.args.cls, dfl=self.args.dfl)

    def preprocess_batch(self, batch):
        # derive padded rboxes from polygon segments kept by the dataset
        b, m = batch["cls"].shape
        rboxes = np.zeros((b, m, 5), np.float32)
        segs = batch.get("segments_list")
        if segs:
            for i, seg_list in enumerate(segs):
                if seg_list:
                    rb = _rboxes_from_segments(seg_list[:m])
                    rboxes[i, : len(rb)] = rb
        else:
            # fall back to axis-aligned: xyxy -> xywh, angle 0
            xyxy = batch["bboxes"]
            rboxes[..., 0] = (xyxy[..., 0] + xyxy[..., 2]) / 2
            rboxes[..., 1] = (xyxy[..., 1] + xyxy[..., 3]) / 2
            rboxes[..., 2] = xyxy[..., 2] - xyxy[..., 0]
            rboxes[..., 3] = xyxy[..., 3] - xyxy[..., 1]
        batch = {**batch, "rboxes": rboxes}
        return super().preprocess_batch(batch)


class OBBPredictor(BasePredictor):
    """Rotated NMS postprocess -> Results.obb."""

    def _forward_fn(self, shape):
        key = ("obb", shape)
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        nc = self.nc
        pre_topk = min(int(self.args.pre_nms_topk), 1024)

        if self.backend is not None:  # exported artifact: (B, A, 4+nc+1) with angle last
            backend = self.backend
            rnms = jax.jit(
                lambda preds: nms_rotated(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc)
            )

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                if isinstance(out, (list, tuple)):
                    out = out[0]
                return rnms(jnp.asarray(out))

            self._jit_cache[key] = backend_fn
            return backend_fn

        model = self.model
        dtype = self.dtype

        @jax.jit
        def fn(variables, x):
            preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            # preds: (B, A, 4 + nc + 1) with angle last
            return nms_rotated(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc)

        self._jit_cache[key] = fn
        return fn

    def postprocess(self, dets, n_valid, x_shape, orig_imgs, paths):
        dets = np.asarray(dets)  # (B, max_det, 7): cx, cy, w, h, angle, conf, cls
        n_valid = np.asarray(n_valid)
        results = []
        for i, (im0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            d = dets[i, :n].copy()
            if n:
                gain = min(x_shape[0] / im0.shape[0], x_shape[1] / im0.shape[1])
                pad_w = (x_shape[1] - im0.shape[1] * gain) / 2
                pad_h = (x_shape[0] - im0.shape[0] * gain) / 2
                d[:, 0] = (d[:, 0] - pad_w) / gain
                d[:, 1] = (d[:, 1] - pad_h) / gain
                d[:, 2:4] /= gain
            results.append(Results(im0, path, self.names, obb=d))
        return results


class OBBValidator(BaseValidator):
    """Rotated-box mAP via probiou TP matching (reference models/yolo/obb/val.py)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.metrics = OBBMetrics()
        self.args.task = "obb"

    def _forward(self, shape):
        key = ("obb", tuple(shape))
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        model = self.model
        nc = self.nc
        pre_topk = int(self.args.pre_nms_topk)
        from drone_yolo_tpu.utils.checks import resolve_dtype as _rd; dtype = _rd(self.args.half)

        if getattr(self, "backend", None) is not None:  # exported artifact: (B, A, 4+nc+1)
            backend = self.backend
            rnms = jax.jit(
                lambda preds: nms_rotated(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc, multi_label=True
                )
            )

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                if isinstance(out, (list, tuple)):
                    out = out[0]
                return rnms(jnp.asarray(out))

            self._jit_cache[key] = backend_fn
            return backend_fn

        @jax.jit
        def fn(variables, x):
            preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            # multi_label=True: validators expand (anchor, class) pairs (reference ops.py:286)
            return nms_rotated(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc, multi_label=True)

        self._jit_cache[key] = fn
        return fn

    def update_metrics(self, dets, n_valid, batch, in_shape):
        dets = np.asarray(dets)
        for i in range(len(dets)):
            self.seen += 1
            n = int(n_valid[i])
            d = dets[i, :n].copy()  # cx cy w h angle conf cls
            gt_mask = batch["mask"][i].astype(bool)
            gt_cls = batch["cls"][i][gt_mask]
            segs = batch.get("segments_list")
            if segs and segs[i]:
                gt_r = _rboxes_from_segments(segs[i])[: len(gt_cls)]
            else:
                bb = batch["bboxes"][i][gt_mask]
                gt_r = np.zeros((len(bb), 5), np.float32)
                if len(bb):
                    gt_r[:, 0] = (bb[:, 0] + bb[:, 2]) / 2
                    gt_r[:, 1] = (bb[:, 1] + bb[:, 3]) / 2
                    gt_r[:, 2] = bb[:, 2] - bb[:, 0]
                    gt_r[:, 3] = bb[:, 3] - bb[:, 1]
            iou = _probiou_np(gt_r, d[:, :5]) if n and len(gt_cls) else np.zeros((len(gt_cls), n))
            tp = match_predictions(d[:, 6].astype(int), gt_cls.astype(int), iou, self.iouv)
            self.stats["tp"].append(tp)
            self.stats["conf"].append(d[:, 5])
            self.stats["pred_cls"].append(d[:, 6])
            self.stats["target_cls"].append(gt_cls)
