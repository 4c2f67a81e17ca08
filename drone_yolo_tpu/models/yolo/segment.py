"""Segmentation task triple (reference models/yolo/segment/{train,val,predict}.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.engine.results import Results
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.engine.validator import BaseValidator
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.ops.boxes import scale_boxes
from drone_yolo_tpu.ops.masks import mask_iou_np, process_mask, scale_masks_np
from drone_yolo_tpu.ops.nms import non_max_suppression
from drone_yolo_tpu.utils.loss import v8SegmentationLoss
from drone_yolo_tpu.utils.metrics import SegmentMetrics, box_iou_np, match_predictions


class SegmentationTrainer(BaseTrainer):
    loss_names = ("box_loss", "seg_loss", "cls_loss", "dfl_loss")

    def get_criterion(self):
        return v8SegmentationLoss(
            self.model, overlap=self.args.overlap_mask, box=self.args.box, cls=self.args.cls, dfl=self.args.dfl
        )


class SegmentationPredictor(BasePredictor):
    """Adds prototype-mask reconstruction to detection postprocess."""

    def _forward_fn(self, shape):
        key = ("seg", shape)
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        nc = self.nc
        pre_topk = min(int(self.args.pre_nms_topk), 1024)

        if self.backend is not None:  # exported artifact: protos ride as output1
            backend = self.backend
            nms = jax.jit(
                lambda preds: non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc
                )
            )

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                assert isinstance(out, (list, tuple)) and len(out) >= 2, "segment artifact must emit protos (output1)"
                dets, n = nms(jnp.asarray(out[0]))
                return (dets, jnp.asarray(out[1])), n

            self._jit_cache[key] = backend_fn
            return backend_fn

        model = self.model
        dtype = self.dtype

        @jax.jit
        def fn(variables, x):
            preds, aux = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            protos = aux[2]
            dets, n = non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc
            )
            return (dets, protos), n

        self._jit_cache[key] = fn
        return fn

    def postprocess(self, out, n_valid, x_shape, orig_imgs, paths):
        dets, protos = out
        dets = np.asarray(dets)
        protos_np = np.asarray(protos, np.float32)
        n_valid = np.asarray(n_valid)
        results = []
        for i, (im0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            d = dets[i, :n].copy()
            masks = None
            if n:
                m = np.asarray(
                    process_mask(jnp.asarray(protos_np[i]), jnp.asarray(d[:, 6:]), jnp.asarray(d[:, :4]), x_shape, upsample=False)
                )
                masks = scale_masks_np(m, im0.shape[:2], x_shape, None) > 0.5
                d[:, :4] = np.asarray(scale_boxes(x_shape, d[:, :4], im0.shape[:2]))
            results.append(Results(im0, path, self.names, boxes=d[:, :6] if n else d, masks=masks))
        return results


class SegmentationValidator(BaseValidator):
    """Box + mask mAP (reference models/yolo/segment/val.py)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.metrics = SegmentMetrics()
        self.args.task = "segment"

    def _forward(self, shape):
        key = ("seg", tuple(shape))
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        nc = self.nc
        model = self.model
        pre_topk = int(self.args.pre_nms_topk)
        from drone_yolo_tpu.utils.checks import resolve_dtype as _rd; dtype = _rd(self.args.half)

        if getattr(self, "backend", None) is not None:  # exported artifact: dets + output1 protos
            backend = self.backend
            nms = jax.jit(
                lambda preds: non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc, multi_label=True
                )
            )

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                assert isinstance(out, (list, tuple)) and len(out) >= 2, "segment artifact must emit protos (output1)"
                dets, n = nms(jnp.asarray(out[0]))
                return (dets, jnp.asarray(out[1])), n

            self._jit_cache[key] = backend_fn
            return backend_fn

        @jax.jit
        def fn(variables, x):
            preds, aux = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            protos = aux[2]
            dets, n = non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk, nc=nc, multi_label=True
            )
            return (dets, protos), n

        self._jit_cache[key] = fn
        return fn

    def update_metrics(self, out, n_valid, batch, in_shape):
        dets, protos = out
        dets = np.asarray(dets)
        protos = np.asarray(protos, np.float32)
        n_valid = np.asarray(n_valid)
        self.stats.setdefault("tp_m", [])
        for i in range(len(dets)):
            self.seen += 1
            n = int(n_valid[i])
            d = dets[i, :n].copy()
            gt_mask = batch["mask"][i].astype(bool)
            gt_boxes_in = batch["bboxes"][i][gt_mask]
            gt_cls = batch["cls"][i][gt_mask]
            ori_shape = batch["ori_shapes"][i]
            rp = batch["ratio_pads"][i]
            n_gt = len(gt_cls)

            # mask TP at proto resolution
            om = batch.get("masks")
            tp_m = np.zeros((n, len(self.iouv)), bool)
            pm = None
            if n and (self.args.save_json or (n_gt and om is not None)):
                pm = np.asarray(
                    process_mask(jnp.asarray(protos[i]), jnp.asarray(d[:, 6:]), jnp.asarray(d[:, :4]), in_shape)
                )
                pm = pm > 0.5
            if n and n_gt and om is not None:
                omi = om[i]
                if omi.shape != pm.shape[1:]:
                    import cv2

                    omi = cv2.resize(omi.astype(np.float32), (pm.shape[2], pm.shape[1]), interpolation=cv2.INTER_NEAREST)
                gm = np.stack([(omi == j + 1) for j in range(n_gt)]).astype(np.float32)
                miou = mask_iou_np(gm, pm)
                tp_m = match_predictions(d[:, 5].astype(int), gt_cls.astype(int), miou, self.iouv)

            # box TP in native space
            if n:
                d[:, :4] = np.asarray(scale_boxes(in_shape, d[:, :4], ori_shape, ratio_pad=((rp[0], rp[0]), rp[1]) if rp else None))
            gt_native = gt_boxes_in.copy()
            if n_gt:
                gt_native = np.asarray(scale_boxes(in_shape, gt_native, ori_shape, ratio_pad=((rp[0], rp[0]), rp[1]) if rp else None))
            iou = box_iou_np(gt_native, d[:, :4]) if n and n_gt else np.zeros((n_gt, n))
            tp = match_predictions(d[:, 5].astype(int), gt_cls.astype(int), iou, self.iouv)

            self.stats["tp"].append(tp)
            self.stats["tp_m"].append(tp_m)
            self.stats["conf"].append(d[:, 4])
            self.stats["pred_cls"].append(d[:, 5])
            self.stats["target_cls"].append(gt_cls)
            if self.args.save_json and n:
                from drone_yolo_tpu.ops.masks import scale_masks_np

                native = scale_masks_np(pm.astype(np.float32), ori_shape, in_shape, ratio_pad=rp) > 0.5
                self.pred_to_json(d, batch["im_files"][i], masks=native)

    def pred_to_json(self, d, im_file, masks=None):
        """COCO records with RLE segmentation (reference segment/val.py:158
        pred_to_json: `encode(np.asarray(x, order="F"))`; we emit uncompressed
        RLE — accepted by pycocotools loadRes and our numpy evaluator)."""
        from pathlib import Path

        from drone_yolo_tpu.utils.cocoeval import rle_encode

        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        for j, (*xyxy, conf, cls) in enumerate(d[:, :6]):
            x1, y1, x2, y2 = xyxy
            rec = {
                "image_id": image_id,
                "category_id": int(cls),
                "bbox": [round(float(x1), 3), round(float(y1), 3), round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                "score": round(float(conf), 5),
            }
            if masks is not None:
                rec["segmentation"] = rle_encode(masks[j])
            self.jdict.append(rec)

    def _gt_coco_dict(self):
        """Detect GT dict + rasterized polygon RLEs for the segm protocol."""
        import cv2

        from drone_yolo_tpu.utils.cocoeval import rle_area, rle_encode

        gt = super()._gt_coco_dict()
        # labels iterate in the same (image, instance) order as the base dict
        by_image = {}
        for lb in self.dataloader.dataset.labels:
            from pathlib import Path

            stem = Path(lb["im_file"]).stem
            by_image[int(stem) if stem.isnumeric() else stem] = lb
        seen: dict = {}  # running per-image annotation counter (one pass, not
        # an O(N^2) rescan of all annotations per annotation — ADVICE r2)
        for ann in sorted(gt["annotations"], key=lambda a: a["id"]):
            lb = by_image[ann["image_id"]]
            h, w = lb["shape"]
            # nth annotation of this image -> nth segment
            idx = seen.get(ann["image_id"], 0)
            seen[ann["image_id"]] = idx + 1
            segs = lb.get("segments") or []
            if idx < len(segs):
                m = np.zeros((int(h), int(w)), np.uint8)
                pts = (np.asarray(segs[idx], np.float32) * [w, h]).astype(np.int32)
                cv2.fillPoly(m, [pts], 1)
                ann["segmentation"] = rle_encode(m.astype(bool))
                ann["area"] = rle_area(ann["segmentation"])
        return gt

    def eval_json(self):
        """bbox + segm COCO eval (reference segment/val.py:278 evaluates both)."""
        stats = super().eval_json()
        if any("segmentation" in d for d in self.jdict):
            from drone_yolo_tpu.utils import LOGGER
            from drone_yolo_tpu.utils.cocoeval import COCOevalNP

            gt = self._gt_coco_dict()
            seg_stats = COCOevalNP(gt, [d for d in self.jdict if "segmentation" in d], iou_type="segm").run()
            LOGGER.info(f"COCO eval (segm): AP={seg_stats['AP']:.4f} AP50={seg_stats['AP50']:.4f}")
            self.coco_stats = {**stats, **{f"{k}(M)": v for k, v in seg_stats.items()}}
            return self.coco_stats
        return stats

    def get_stats(self):
        tp = np.concatenate(self.stats["tp"]) if self.stats["tp"] else np.zeros((0, len(self.iouv)), bool)
        tp_m = np.concatenate(self.stats["tp_m"]) if self.stats.get("tp_m") else np.zeros((0, len(self.iouv)), bool)
        conf = np.concatenate(self.stats["conf"]) if self.stats["conf"] else np.zeros(0)
        pred_cls = np.concatenate(self.stats["pred_cls"]) if self.stats["pred_cls"] else np.zeros(0)
        target_cls = np.concatenate(self.stats["target_cls"]) if self.stats["target_cls"] else np.zeros(0)
        if len(conf):
            self.metrics.process(tp, tp_m, conf, pred_cls, target_cls)
        self.nt_per_class = np.bincount(target_cls.astype(int), minlength=self.nc)
        keys = self.metrics.keys
        return dict(zip(keys, self.metrics.mean_results()))

    def print_results(self):
        from drone_yolo_tpu.utils import LOGGER

        pf = "%22s%11i%11i" + "%11.3g" * 8
        LOGGER.info(("%22s%11s%11s" + "%11s" * 8) % ("Class", "Images", "Instances", "P", "R", "mAP50", "mAP50-95", "P(M)", "R(M)", "mAP50(M)", "mAP50-95(M)"))
        LOGGER.info(pf % ("all", self.seen, int(self.nt_per_class.sum()), *self.metrics.mean_results()))
        t = self.speed
        LOGGER.info(f"Speed: {t['preprocess']:.1f}ms preprocess, {t['inference']:.1f}ms inference, {t['postprocess']:.1f}ms postprocess per image")
