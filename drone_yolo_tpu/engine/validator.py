"""Validator: batched eval with on-device NMS, host-side TP matching + mAP.

Capability parity with `ultralytics/engine/validator.py:42-343` (BaseValidator)
and `models/yolo/detect/val.py:17-341` (DetectionValidator incl. COCO-JSON
export). Device produces fixed-shape (max_det, 6) detections per image; the host
only does IoU matching and metric accumulation.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.cfg import get_cfg, get_save_dir
from drone_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from drone_yolo_tpu.data.utils import check_det_dataset
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.ops.boxes import scale_boxes
from drone_yolo_tpu.ops.nms import non_max_suppression
from drone_yolo_tpu.utils import LOGGER, TQDM, colorstr
from drone_yolo_tpu.utils.callbacks import CallbackMixin, get_default_callbacks
from drone_yolo_tpu.utils.metrics import ConfusionMatrix, DetMetrics, box_iou_np, match_predictions


@jax.jit
def _u8_to_unit(x):
    """uint8 NHWC -> float32 [0, 1] on device."""
    return x.astype(jnp.float32) / 255.0


class BaseValidator(CallbackMixin):
    """Shared eval loop; task subclasses specialize postprocess/metrics."""

    def __init__(self, dataloader=None, save_dir=None, args=None, _callbacks=None):
        self.args = get_cfg(overrides=args if isinstance(args, dict) else (vars(args) if args else None))
        if self.args.conf is None:
            self.args.conf = 0.001
        self.args.task = self.args.task or "detect"
        self.dataloader = dataloader
        self.save_dir = Path(save_dir) if save_dir else get_save_dir(self.args)
        self.callbacks = _callbacks or get_default_callbacks()
        self.iouv = np.linspace(0.5, 0.95, 10)
        self.metrics = DetMetrics()
        self.jdict = []
        self.speed = {}
        self._jit_cache = {}

    @staticmethod
    def adapt_raw(preds):
        """Hook: adapt a model's raw output to the uniform (B, A, 4+nc)
        contract before NMS (overridden by NASValidator for (boxes, scores)
        pair emitters — reference models/nas/val.py)."""
        return preds

    def __call__(self, model=None, variables=None):
        """Validate a YOLO facade, or an AutoBackend artifact (reference
        validator.py:128 AutoBackend branch) — optionally with explicit
        variables, e.g. EMA."""
        from drone_yolo_tpu.nn.autobackend import AutoBackend
        from drone_yolo_tpu.utils import enable_compile_cache

        enable_compile_cache()
        self.run_callbacks("on_val_start")
        facade = model
        imgsz = int(self.args.imgsz)
        self.backend = facade if isinstance(facade, AutoBackend) else None
        if self.backend is not None:
            self.model = self.backend.model  # may be None (savedmodel/tflite)
            self.nc = self.backend.nc
            self.names = self.backend.names
            self.variables = variables = None
            stride_max = int(max(self.backend.stride))
            if getattr(self.args, "rect", False):
                # exported artifacts are compiled for ONE input shape; rect-val
                # shape buckets would feed shapes the graph cannot accept
                LOGGER.info("rect=True disabled for fixed-shape backend artifact (square letterbox val)")
                self.args.rect = False
        else:
            self.model = facade.model
            self.nc = self.model.nc
            if variables is None:
                facade.ensure_variables(imgsz=imgsz)
                variables = self.model.fuse(facade.variables)
            self.variables = variables
            self.names = self.model.names
            stride_max = int(max(self.model.stride))
        self.metrics.names = self.names
        self.confusion_matrix = ConfusionMatrix(nc=self.nc, conf=self.args.conf)

        if self.dataloader is None:
            data = check_det_dataset(self.args.data)
            self.data = data
            self.names = data.get("names", self.names)
            self.metrics.names = self.names
            dataset = build_yolo_dataset(self.args, data["val"], int(self.args.batch), data, mode="val", stride=stride_max)
            self.dataloader = build_dataloader(dataset, int(self.args.batch), self.args.workers, shuffle=False, drop_last=False)

        self.stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        self.seen = 0
        dt = [0.0, 0.0, 0.0]
        dt_all = [0.0, 0.0, 0.0]  # compile-inclusive fallback (tiny runs)
        timed = 0  # images timed AFTER compilation (first batch per shape excluded)
        n_batches = len(self.dataloader)
        bar = TQDM(self.dataloader, total=n_batches, desc="val")
        for batch in bar:
            self.run_callbacks("on_val_batch_start")
            compiled = tuple(batch["img"].shape) in self._jit_cache
            t0 = time.perf_counter()
            if self.backend is None:
                # ship uint8 and normalize on device: 4x less host->device
                # traffic than f32 (the validator's dominant cost on
                # bandwidth-constrained links)
                x = _u8_to_unit(jnp.asarray(np.ascontiguousarray(batch["img"])))
            else:
                x = batch["img"].astype(np.float32) / 255.0
            t1 = time.perf_counter()
            out, n_valid = self._forward(batch["img"].shape)(self.variables, x)
            n_valid = np.asarray(n_valid)
            t2 = time.perf_counter()
            self.update_metrics(out, n_valid, batch, batch["img"].shape[1:3])
            t3 = time.perf_counter()
            if compiled:  # exclude compile time from the speed report
                dt[0] += t1 - t0
                dt[1] += t2 - t1
                dt[2] += t3 - t2
                timed += len(batch["img"])
            else:  # keep compile-inclusive totals as the fallback report
                dt_all[0] += t1 - t0
                dt_all[1] += t2 - t1
                dt_all[2] += t3 - t2
            self.run_callbacks("on_val_batch_end")

        stats = self.get_stats()
        if timed == 0:  # every batch was a first-compile batch: report totals
            dt, timed = dt_all, self.seen
        denom = max(timed, 1)
        self.speed = {
            "preprocess": dt[0] / denom * 1e3,
            "inference": dt[1] / denom * 1e3,
            "postprocess": dt[2] / denom * 1e3,
        }
        self.print_results()
        if self.args.save_json and self.jdict:
            out = self.save_dir / "predictions.json"
            out.parent.mkdir(parents=True, exist_ok=True)
            with open(out, "w", encoding="utf-8") as f:
                json.dump(self.jdict, f)
            LOGGER.info(f"saved {len(self.jdict)} predictions to {out}")
            self.eval_json()
        self.run_callbacks("on_val_end")
        results = {**stats, "fitness": self.metrics.fitness}
        return {k: round(float(v), 5) for k, v in results.items()}

    # -- device forward -------------------------------------------------------
    def _forward(self, shape):
        key = tuple(shape)
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        nc = self.nc
        pre_topk = int(self.args.pre_nms_topk)
        model = self.model
        from drone_yolo_tpu.utils.checks import resolve_dtype as _rd; dtype = _rd(self.args.half)

        if getattr(self, "backend", None) is not None:
            backend = self.backend
            nms = jax.jit(
                lambda preds: non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk,
                    nc=nc, multi_label=True,
                )
            )

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                if isinstance(out, (list, tuple)):  # multi-output artifacts (e.g. segment
                    out = out[0]  # ONNX): element 0 is the detection tensor
                preds = self.adapt_raw(out)
                return nms(jnp.asarray(preds))

            self._jit_cache[key] = backend_fn
            return backend_fn

        end2end = isinstance(getattr(model, "head", None), M.v10Detect)

        @jax.jit
        def fn(variables, x):
            preds, _ = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            preds = self.adapt_raw(preds)
            if end2end:  # NMS-free head emits sorted (B, max_det, 6) directly
                dets = preds[:, :max_det]
                n_valid = jnp.sum(dets[..., 4] > conf, axis=-1).astype(jnp.int32)
                dets = dets * (dets[..., 4:5] > conf).astype(dets.dtype)
                return dets, n_valid
            return non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk,
                nc=nc, multi_label=True,
            )

        self._jit_cache[key] = fn
        return fn

    # -- metrics ----------------------------------------------------------------
    def update_metrics(self, dets, n_valid, batch, in_shape):
        dets = np.asarray(dets)
        for i in range(len(dets)):
            self.seen += 1
            d = dets[i, : int(n_valid[i])].copy()
            gt_mask = batch["mask"][i].astype(bool)
            gt_boxes_in = batch["bboxes"][i][gt_mask]  # letterboxed pixel xyxy
            gt_cls = batch["cls"][i][gt_mask]
            ori_shape = batch["ori_shapes"][i]
            rp = batch["ratio_pads"][i]
            if len(d):
                d[:, :4] = np.asarray(scale_boxes(in_shape, d[:, :4], ori_shape, ratio_pad=((rp[0], rp[0]), rp[1]) if rp else None))
            gt_native = gt_boxes_in.copy()
            if len(gt_native):
                gt_native = np.asarray(scale_boxes(in_shape, gt_native, ori_shape, ratio_pad=((rp[0], rp[0]), rp[1]) if rp else None))
            iou = box_iou_np(gt_native, d[:, :4]) if len(d) and len(gt_native) else np.zeros((len(gt_native), len(d)))
            tp = match_predictions(d[:, 5].astype(int), gt_cls.astype(int), iou, self.iouv)
            self.stats["tp"].append(tp)
            self.stats["conf"].append(d[:, 4])
            self.stats["pred_cls"].append(d[:, 5])
            self.stats["target_cls"].append(gt_cls)
            if self.args.plots:
                self.confusion_matrix.process_batch(d, gt_native, gt_cls)
            if self.args.save_json:
                self.pred_to_json(d, batch["im_files"][i])

    def get_stats(self):
        tp = np.concatenate(self.stats["tp"]) if self.stats["tp"] else np.zeros((0, len(self.iouv)), bool)
        conf = np.concatenate(self.stats["conf"]) if self.stats["conf"] else np.zeros(0)
        pred_cls = np.concatenate(self.stats["pred_cls"]) if self.stats["pred_cls"] else np.zeros(0)
        target_cls = np.concatenate(self.stats["target_cls"]) if self.stats["target_cls"] else np.zeros(0)
        if len(conf):
            self.metrics.process(tp, conf, pred_cls, target_cls)
        self.nt_per_class = np.bincount(target_cls.astype(int), minlength=self.nc)
        mp, mr, map50, map5095 = self.metrics.mean_results()
        return {
            "metrics/precision(B)": mp,
            "metrics/recall(B)": mr,
            "metrics/mAP50(B)": map50,
            "metrics/mAP50-95(B)": map5095,
        }

    def print_results(self):
        pf = "%22s%11i%11i%11.3g%11.3g%11.3g%11.3g"
        LOGGER.info(("%22s%11s%11s%11s%11s%11s%11s") % ("Class", "Images", "Instances", "P", "R", "mAP50", "mAP50-95"))
        LOGGER.info(pf % ("all", self.seen, int(self.nt_per_class.sum()), *self.metrics.mean_results()))
        if self.args.verbose and self.nc > 1 and len(self.metrics.box.ap_class_index):
            for i, c in enumerate(self.metrics.box.ap_class_index):
                name = self.names.get(int(c), str(c)) if isinstance(self.names, dict) else self.names[int(c)]
                LOGGER.info(pf % (name, self.seen, int(self.nt_per_class[int(c)]), *self.metrics.class_result(i)))
        t = self.speed
        LOGGER.info(f"Speed: {t['preprocess']:.1f}ms preprocess, {t['inference']:.1f}ms inference, {t['postprocess']:.1f}ms postprocess per image")

    # -- COCO json ---------------------------------------------------------------
    def pred_to_json(self, d, im_file):
        """COCO-format prediction records (reference detect/val.py:301)."""
        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        for *xyxy, conf, cls in d[:, :6]:
            x1, y1, x2, y2 = xyxy
            self.jdict.append(
                {
                    "image_id": image_id,
                    "category_id": int(cls),
                    "bbox": [round(float(x1), 3), round(float(y1), 3), round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                    "score": round(float(conf), 5),
                }
            )

    def _gt_coco_dict(self):
        """Build a COCO-format GT dict from the val dataset labels (original
        pixel space, 0-based contiguous category ids matching pred_to_json)."""
        ds = self.dataloader.dataset
        images, annotations = [], []
        ann_id = 1
        for lb in ds.labels:
            stem = Path(lb["im_file"]).stem
            image_id = int(stem) if stem.isnumeric() else stem
            h, w = lb["shape"]
            images.append({"id": image_id, "height": int(h), "width": int(w)})
            for c, bn in zip(lb["cls"], lb["bboxes_n"]):
                cx, cy, bw, bh = bn
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": image_id,
                        "category_id": int(c),
                        "bbox": [float((cx - bw / 2) * w), float((cy - bh / 2) * h), float(bw * w), float(bh * h)],
                        "area": float(bw * w * bh * h),
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
        cats = [{"id": i, "name": str(n)} for i, n in (self.names.items() if isinstance(self.names, dict) else enumerate(self.names))]
        return {"images": images, "annotations": annotations, "categories": cats}

    def eval_json(self):
        """COCO-protocol mAP on predictions.json (reference detect/val.py:310-341).

        Uses pycocotools when importable; otherwise the vendored numpy COCOeval
        (`utils/cocoeval.py`), which implements the same protocol. Returns the
        stats dict and logs AP / AP50.
        """
        gt = self._gt_coco_dict()
        try:
            from pycocotools.coco import COCO
            from pycocotools.cocoeval import COCOeval

            coco_gt = COCO()
            coco_gt.dataset = gt
            coco_gt.createIndex()
            coco_dt = coco_gt.loadRes(self.jdict)
            ev = COCOeval(coco_gt, coco_dt, "bbox")
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
            stats = {"AP": float(ev.stats[0]), "AP50": float(ev.stats[1])}
        except ImportError:
            from drone_yolo_tpu.utils.cocoeval import COCOevalNP

            stats = COCOevalNP(gt, self.jdict).run()
        LOGGER.info(f"COCO eval: AP={stats['AP']:.4f} AP50={stats['AP50']:.4f}")
        self.coco_stats = stats
        return stats


class DetectionValidator(BaseValidator):
    """Detection task validator (reference models/yolo/detect/val.py:17)."""
