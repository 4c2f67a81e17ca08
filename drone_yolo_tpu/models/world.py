"""YOLOWorld facade (reference models/yolo/model.py:62 YOLOWorld)."""

from __future__ import annotations

from drone_yolo_tpu.engine.model import YOLO
from drone_yolo_tpu.nn.model import WorldModel


class YOLOWorld(YOLO):
    """Open-vocabulary YOLO: set classes by text (or precomputed embeddings)."""

    MODEL_CLASS = WorldModel

    def __init__(self, model: str = "yolov8s-worldv2.yaml", verbose: bool = False):
        super().__init__(model=model, task="detect", verbose=verbose)

    def set_classes(self, classes, embeddings=None):
        """Define the detectable vocabulary; invalidates cached variables' head bias."""
        self.model.set_classes(classes, embeddings=embeddings)
        self.predictor = None  # force re-jit with the new class count
