"""YOLO-NAS wrapper (reference models/nas/, 204 LoC): facade + pre/post
adapters around an externally-trained NAS checkpoint."""

from drone_yolo_tpu.models.nas.model import NAS
from drone_yolo_tpu.models.nas.predict import NASPredictor
from drone_yolo_tpu.models.nas.val import NASValidator

__all__ = ["NAS", "NASPredictor", "NASValidator"]
