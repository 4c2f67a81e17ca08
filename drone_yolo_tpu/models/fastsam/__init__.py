"""FastSAM: segment-anything via a YOLOv8-seg model + prompt post-filters.

Capability parity with `ultralytics/models/fastsam/` (FastSAM model facade +
FastSAMPredictor prompt handling: everything-mode, box/point/text prompts).
"""

from drone_yolo_tpu.models.fastsam.model import FastSAM
from drone_yolo_tpu.models.fastsam.prompt import prompt_results

__all__ = ["FastSAM", "prompt_results"]
