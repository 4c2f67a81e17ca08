"""YOLO task registry: {task: {model, trainer, validator, predictor}}.

Capability parity with the reference's task_map (`models/yolo/model.py:26-59`).
"""

from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.engine.validator import BaseValidator, DetectionValidator
from drone_yolo_tpu.models.yolo.classify import (
    ClassificationPredictor,
    ClassificationTrainer,
    ClassificationValidator,
)
from drone_yolo_tpu.models.yolo.obb import OBBPredictor, OBBTrainer, OBBValidator
from drone_yolo_tpu.models.yolo.pose import PosePredictor, PoseTrainer, PoseValidator
from drone_yolo_tpu.models.yolo.segment import (
    SegmentationPredictor,
    SegmentationTrainer,
    SegmentationValidator,
)
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


from drone_yolo_tpu.models.rtdetr import RTDETRPredictor, RTDETRTrainer, RTDETRValidator
from drone_yolo_tpu.nn.model import RTDETRDetectionModel

TASK_MAP = {
    "rtdetr": {
        "model": RTDETRDetectionModel,
        "trainer": RTDETRTrainer,
        "validator": RTDETRValidator,
        "predictor": RTDETRPredictor,
    },
    "detect": {
        "model": DetectionModel,
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "segment": {
        "model": SegmentationModel,
        "trainer": SegmentationTrainer,
        "validator": SegmentationValidator,
        "predictor": SegmentationPredictor,
    },
    "pose": {
        "model": PoseModel,
        "trainer": PoseTrainer,
        "validator": PoseValidator,
        "predictor": PosePredictor,
    },
    "obb": {
        "model": OBBModel,
        "trainer": OBBTrainer,
        "validator": OBBValidator,
        "predictor": OBBPredictor,
    },
    "classify": {
        "model": ClassificationModel,
        "trainer": ClassificationTrainer,
        "validator": ClassificationValidator,
        "predictor": ClassificationPredictor,
    },
}
