"""RT-DETR trainer (reference models/rtdetr/train.py)."""

from __future__ import annotations

from drone_yolo_tpu.engine.trainer import BaseTrainer


class RTDETRTrainer(BaseTrainer):
    loss_names = ("cls_loss", "l1_loss", "giou_loss")

    def get_criterion(self):
        from drone_yolo_tpu.models.rtdetr.loss import RTDETRDetectionLoss

        return RTDETRDetectionLoss(nc=self.model.nc)

    def get_validator(self):
        from drone_yolo_tpu.models.rtdetr.val import RTDETRValidator

        return RTDETRValidator(
            args={**vars(self.args), "mode": "val", "rect": False, "conf": 0.001, "plots": False},
            save_dir=self.save_dir,
        )
