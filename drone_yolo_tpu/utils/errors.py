"""Custom exceptions (reference `ultralytics/utils/errors.py`)."""

from drone_yolo_tpu.utils import emojis


class HUBModelError(Exception):
    """Raised when a HUB model identifier cannot be resolved."""

    def __init__(self, message: str = "Model not found locally. Zero-egress build: no remote fetch available."):
        super().__init__(emojis(message))
