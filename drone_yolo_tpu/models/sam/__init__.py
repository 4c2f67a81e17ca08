"""SAM: promptable segmentation (reference models/sam/, 7.7k LoC family).

Implemented: SAM-1 image model (ViT-B/L/H encoders with windowed + decomposed
rel-pos attention, prompt encoder, two-way mask decoder), point/box-prompt
Predictor, and grid-based automatic mask generation. SAM2 video tracking is
scheduled for a later round.
"""

from drone_yolo_tpu.models.sam.model import SAM, SAMModel
from drone_yolo_tpu.models.sam.amg import auto_mask_generate

__all__ = ["SAM", "SAMModel", "auto_mask_generate"]
