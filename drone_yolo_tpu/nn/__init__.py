"""NN layer zoo, graph builder, and task models."""

from drone_yolo_tpu.nn.model import (
    BaseModel,
    ClassificationModel,
    DetectionModel,
    OBBModel,
    PoseModel,
    SegmentationModel,
    guess_model_task,
)

__all__ = [
    "BaseModel",
    "ClassificationModel",
    "DetectionModel",
    "OBBModel",
    "PoseModel",
    "SegmentationModel",
    "guess_model_task",
]
