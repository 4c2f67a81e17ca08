"""YOLO task registry: {task: {model, trainer, validator, predictor}}.

Capability parity with the reference's task_map (`models/yolo/model.py:26-59`).
Detection is fully wired; segment/pose/obb/classify share the detect machinery
until their specialized losses/postprocess land (tracked for later rounds).
"""

from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.engine.validator import BaseValidator, DetectionValidator
from drone_yolo_tpu.nn.model import (
    ClassificationModel,
    DetectionModel,
    OBBModel,
    PoseModel,
    SegmentationModel,
)


class DetectionPredictor(BasePredictor):
    """Detection predictor (reference models/yolo/detect/predict.py:8)."""


class DetectionTrainer(BaseTrainer):
    """Detection trainer (reference models/yolo/detect/train.py:19)."""


TASK_MAP = {
    "detect": {
        "model": DetectionModel,
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "segment": {
        "model": SegmentationModel,
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "pose": {
        "model": PoseModel,
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "obb": {
        "model": OBBModel,
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "classify": {
        "model": ClassificationModel,
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
}
