"""Import the torch reference implementation for golden-parity tests.

The reference snapshot expects torchvision, which this image lacks; we shim the
two touchpoints (metadata version + torchvision.ops.nms) with pure-torch
equivalents. Tests using the reference must call `load_reference()` and skip if
it returns None. This is dev-time test scaffolding only — the framework itself
never imports torch.
"""

from __future__ import annotations

import sys
import types

_REF = None
_TRIED = False


def _install_torchvision_stub():
    import importlib.metadata as md

    import torch

    if "torchvision" in sys.modules:
        return
    orig_version = md.version

    def version(name):
        if name == "torchvision":
            return "0.18.0"
        return orig_version(name)

    md.version = version

    def nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou_threshold: float):
        """Pure-torch greedy NMS (xyxy), same contract as torchvision.ops.nms."""
        order = scores.argsort(descending=True)
        keep = []
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        for idx in order.tolist():
            if suppressed[idx]:
                continue
            keep.append(idx)
            xx1 = torch.maximum(boxes[idx, 0], boxes[:, 0])
            yy1 = torch.maximum(boxes[idx, 1], boxes[:, 1])
            xx2 = torch.minimum(boxes[idx, 2], boxes[:, 2])
            yy2 = torch.minimum(boxes[idx, 3], boxes[:, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[idx] + areas - inter + 1e-7)
            suppressed |= iou > iou_threshold
        return torch.as_tensor(keep, dtype=torch.long)

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.18.0"
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.nms = nms
    tv.ops = tv_ops
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.transforms"] = tv_transforms


def load_reference():
    """Return the reference `ultralytics` package, or None if unavailable."""
    global _REF, _TRIED
    if _TRIED:
        return _REF
    _TRIED = True
    try:
        _install_torchvision_stub()
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        import ultralytics  # noqa: F401

        _REF = ultralytics
    except Exception as e:  # noqa: BLE001
        print(f"reference unavailable: {e}")
        _REF = None
    return _REF
