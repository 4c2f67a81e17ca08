"""RT-DETR facade (reference models/rtdetr/model.py)."""

from __future__ import annotations

from drone_yolo_tpu.engine.model import YOLO


class RTDETR(YOLO):
    """RT-DETR interface: YOLO facade with the rtdetr task triple."""

    def __init__(self, model: str = "rtdetr-l.yaml"):
        super().__init__(model=model, task="rtdetr")

    def _new(self, cfg, task=None, verbose=False):
        from drone_yolo_tpu.nn.model import RTDETRDetectionModel

        self.task = "rtdetr"
        self.model = RTDETRDetectionModel(cfg, verbose=verbose)
        self.cfg = cfg
        self.overrides = {"model": cfg, "task": self.task}
        self.variables = None
