"""NAS validator (reference models/nas/val.py): same conversion ahead of the
standard DetectionValidator NMS + matching + mAP pipeline."""

from drone_yolo_tpu.engine.validator import DetectionValidator


class NASValidator(DetectionValidator):
    @staticmethod
    def adapt_raw(preds):
        from drone_yolo_tpu.models.nas.model import adapt_nas_pair

        return adapt_nas_pair(preds)
