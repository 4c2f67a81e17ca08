"""RT-DETR: real-time detection transformer (reference models/rtdetr/)."""

from drone_yolo_tpu.models.rtdetr.model import RTDETR
from drone_yolo_tpu.models.rtdetr.train import RTDETRTrainer
from drone_yolo_tpu.models.rtdetr.val import RTDETRValidator
from drone_yolo_tpu.models.rtdetr.predict import RTDETRPredictor

__all__ = ["RTDETR", "RTDETRTrainer", "RTDETRValidator", "RTDETRPredictor"]
