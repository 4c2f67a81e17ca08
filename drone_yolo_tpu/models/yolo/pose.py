"""Pose task triple (reference models/yolo/pose/{train,val,predict}.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.engine.results import Results
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.engine.validator import BaseValidator
from drone_yolo_tpu.ops.boxes import scale_boxes
from drone_yolo_tpu.utils.loss import v8PoseLoss
from drone_yolo_tpu.utils.metrics import PoseMetrics, box_iou_np, kpt_iou, match_predictions

OKS_SIGMA_NP = np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]) / 10.0


def _scale_kpts(kpts, in_shape, ori_shape, rp=None):
    """Un-letterbox keypoints to native image space."""
    if rp is not None:
        gain, (pad_w, pad_h) = rp
    else:
        gain = min(in_shape[0] / ori_shape[0], in_shape[1] / ori_shape[1])
        pad_w = (in_shape[1] - ori_shape[1] * gain) / 2
        pad_h = (in_shape[0] - ori_shape[0] * gain) / 2
    out = kpts.copy()
    out[..., 0] = (out[..., 0] - pad_w) / gain
    out[..., 1] = (out[..., 1] - pad_h) / gain
    return out


class PoseTrainer(BaseTrainer):
    loss_names = ("box_loss", "pose_loss", "kobj_loss", "cls_loss", "dfl_loss")

    def get_criterion(self):
        return v8PoseLoss(
            self.model, pose_gain=self.args.pose, kobj_gain=self.args.kobj,
            box=self.args.box, cls=self.args.cls, dfl=self.args.dfl,
        )


class PosePredictor(BasePredictor):
    """Detection postprocess + keypoint unpacking (extras carry nk*3 columns)."""

    def postprocess(self, dets, n_valid, x_shape, orig_imgs, paths):
        dets = np.asarray(dets)
        n_valid = np.asarray(n_valid)
        nk, nd = self.model.head.kpt_shape
        results = []
        for i, (im0, path) in enumerate(zip(orig_imgs, paths)):
            n = int(n_valid[i])
            d = dets[i, :n].copy()
            kpts = None
            if n:
                kpts = d[:, 6:].reshape(n, nk, nd)
                kpts = _scale_kpts(kpts, x_shape, im0.shape[:2])
                d[:, :4] = np.asarray(scale_boxes(x_shape, d[:, :4], im0.shape[:2]))
            results.append(Results(im0, path, self.names, boxes=d[:, :6] if n else d, keypoints=kpts))
        return results


class PoseValidator(BaseValidator):
    """Box + OKS pose mAP (reference models/yolo/pose/val.py)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.metrics = PoseMetrics()
        self.args.task = "pose"

    def update_metrics(self, dets, n_valid, batch, in_shape):
        dets = np.asarray(dets)
        self.stats.setdefault("tp_p", [])
        nk, nd = self.model.head.kpt_shape
        sigmas = OKS_SIGMA_NP if nk == 17 else np.ones(nk) / nk
        for i in range(len(dets)):
            self.seen += 1
            n = int(n_valid[i])
            d = dets[i, :n].copy()
            gt_mask = batch["mask"][i].astype(bool)
            gt_boxes_in = batch["bboxes"][i][gt_mask]
            gt_cls = batch["cls"][i][gt_mask]
            gt_kpts_in = batch["keypoints"][i][gt_mask] if "keypoints" in batch else np.zeros((0, nk, 3))
            ori_shape = batch["ori_shapes"][i]
            rp = batch["ratio_pads"][i]
            n_gt = len(gt_cls)

            pk = d[:, 6:].reshape(n, nk, nd) if n else np.zeros((0, nk, nd))
            if n:
                pk = _scale_kpts(pk, in_shape, ori_shape, rp)
                d[:, :4] = np.asarray(scale_boxes(in_shape, d[:, :4], ori_shape, ratio_pad=((rp[0], rp[0]), rp[1]) if rp else None))
            gt_native = gt_boxes_in.copy()
            gk = gt_kpts_in.copy()
            if n_gt:
                gt_native = np.asarray(scale_boxes(in_shape, gt_native, ori_shape, ratio_pad=((rp[0], rp[0]), rp[1]) if rp else None))
                gk = _scale_kpts(gk, in_shape, ori_shape, rp)

            iou = box_iou_np(gt_native, d[:, :4]) if n and n_gt else np.zeros((n_gt, n))
            tp = match_predictions(d[:, 5].astype(int), gt_cls.astype(int), iou, self.iouv)
            if n and n_gt:
                area = (gt_native[:, 2] - gt_native[:, 0]) * (gt_native[:, 3] - gt_native[:, 1]) * 0.53
                oks = kpt_iou(gk, pk, area, sigmas)
                tp_p = match_predictions(d[:, 5].astype(int), gt_cls.astype(int), oks, self.iouv)
            else:
                tp_p = np.zeros((n, len(self.iouv)), bool)

            self.stats["tp"].append(tp)
            self.stats["tp_p"].append(tp_p)
            self.stats["conf"].append(d[:, 4])
            self.stats["pred_cls"].append(d[:, 5])
            self.stats["target_cls"].append(gt_cls)
            if self.args.save_json and n:
                self.pred_to_json(d, batch["im_files"][i], pk)

    def pred_to_json(self, d, im_file, kpts):
        """COCO keypoint records (reference pose/val.py:225): bbox xywh +
        flattened native-space keypoints."""
        from pathlib import Path

        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        for j, (*xyxy, conf, cls) in enumerate(d[:, :6]):
            x1, y1, x2, y2 = xyxy
            self.jdict.append(
                {
                    "image_id": image_id,
                    "category_id": int(cls),
                    "bbox": [round(float(x1), 3), round(float(y1), 3), round(float(x2 - x1), 3), round(float(y2 - y1), 3)],
                    "keypoints": [round(float(v), 3) for v in np.asarray(kpts[j]).reshape(-1)],
                    "score": round(float(conf), 5),
                }
            )

    def _gt_coco_dict(self):
        """Detect GT dict + per-annotation keypoints for the OKS protocol."""
        from pathlib import Path

        gt = super()._gt_coco_dict()
        by_image = {}
        for lb in self.dataloader.dataset.labels:
            stem = Path(lb["im_file"]).stem
            by_image[int(stem) if stem.isnumeric() else stem] = lb
        seen = {}
        for ann in gt["annotations"]:
            lb = by_image[ann["image_id"]]
            h, w = lb["shape"]
            idx = seen.get(ann["image_id"], 0)
            seen[ann["image_id"]] = idx + 1
            kp = lb.get("keypoints")
            if kp is not None and idx < len(kp):
                k = np.asarray(kp[idx], np.float32).copy()
                k[..., 0] *= w
                k[..., 1] *= h
                ann["keypoints"] = [round(float(v), 3) for v in k.reshape(-1)]
                ann["num_keypoints"] = int((k[..., 2] > 0).sum()) if k.shape[-1] == 3 else k.shape[0]
        return gt

    def eval_json(self):
        """bbox + OKS-keypoints COCO eval (reference pose/val.py:242-263)."""
        stats = super().eval_json()
        if any("keypoints" in d for d in self.jdict):
            from drone_yolo_tpu.utils import LOGGER
            from drone_yolo_tpu.utils.cocoeval import COCOevalNP

            gt = self._gt_coco_dict()
            kp_stats = COCOevalNP(gt, [d for d in self.jdict if "keypoints" in d], iou_type="keypoints").run()
            LOGGER.info(f"COCO eval (keypoints): AP={kp_stats['AP']:.4f} AP50={kp_stats['AP50']:.4f}")
            self.coco_stats = {**stats, **{f"{k}(P)": v for k, v in kp_stats.items()}}
            return self.coco_stats
        return stats

    def get_stats(self):
        tp = np.concatenate(self.stats["tp"]) if self.stats["tp"] else np.zeros((0, len(self.iouv)), bool)
        tp_p = np.concatenate(self.stats["tp_p"]) if self.stats.get("tp_p") else np.zeros((0, len(self.iouv)), bool)
        conf = np.concatenate(self.stats["conf"]) if self.stats["conf"] else np.zeros(0)
        pred_cls = np.concatenate(self.stats["pred_cls"]) if self.stats["pred_cls"] else np.zeros(0)
        target_cls = np.concatenate(self.stats["target_cls"]) if self.stats["target_cls"] else np.zeros(0)
        if len(conf):
            self.metrics.process(tp, tp_p, conf, pred_cls, target_cls)
        self.nt_per_class = np.bincount(target_cls.astype(int), minlength=self.nc)
        return dict(zip(self.metrics.keys, self.metrics.mean_results()))

    def print_results(self):
        from drone_yolo_tpu.utils import LOGGER

        pf = "%22s%11i%11i" + "%11.3g" * 8
        LOGGER.info(("%22s%11s%11s" + "%11s" * 8) % ("Class", "Images", "Instances", "P", "R", "mAP50", "mAP50-95", "P(P)", "R(P)", "mAP50(P)", "mAP50-95(P)"))
        LOGGER.info(pf % ("all", self.seen, int(self.nt_per_class.sum()), *self.metrics.mean_results()))
        t = self.speed
        LOGGER.info(f"Speed: {t['preprocess']:.1f}ms preprocess, {t['inference']:.1f}ms inference, {t['postprocess']:.1f}ms postprocess per image")
