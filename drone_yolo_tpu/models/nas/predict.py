"""NAS predictor (reference models/nas/predict.py): converts the NAS output
pair to the uniform pre-NMS tensor; everything downstream (NMS, scale_boxes,
Results) is the shared detect stack."""

from drone_yolo_tpu.engine.predictor import BasePredictor


class NASPredictor(BasePredictor):
    @staticmethod
    def adapt_raw(preds):
        from drone_yolo_tpu.models.nas.model import adapt_nas_pair

        return adapt_nas_pair(preds)
