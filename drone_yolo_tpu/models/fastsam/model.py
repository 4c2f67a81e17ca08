"""FastSAM facade (reference models/fastsam/model.py)."""

from __future__ import annotations

from drone_yolo_tpu.engine.model import YOLO
from drone_yolo_tpu.models.fastsam.prompt import prompt_results


class FastSAM(YOLO):
    """Segment-anything-style interface over the FastSAM (v8-seg, nc=1) arch.

    Usage: FastSAM("FastSAMs.yaml")(source, bboxes=..., points=..., labels=...,
    texts=...) — prompts filter the everything-mode masks.
    """

    def __init__(self, model="FastSAMs.yaml"):
        super().__init__(model=model, task="segment")

    def predict(self, source=None, stream: bool = False, bboxes=None, points=None, labels=None, texts=None, **kwargs):
        results = super().predict(source, stream, **kwargs)
        if any(p is not None for p in (bboxes, points, labels, texts)):
            results = [prompt_results(r, bboxes=bboxes, points=points, labels=labels, texts=texts) for r in results]
        return results
