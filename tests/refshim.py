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


def patch_reference_repvgg():
    """Register RepVGGBlock into the reference's parse_model.

    The reference snapshot exports RepVGGBlock (`nn/modules/__init__.py:62`) but
    never imports it in `nn/tasks.py`, so `parse_model`'s `globals()[m]` lookup
    raises KeyError on the drone yamls, and it is absent from `base_modules` so
    width scaling would not apply (SURVEY.md §2.3 latent defect). The author
    trained on an earlier snapshot where it was wired. This re-creates that
    wiring for parity tests only: rebuild parse_model from its own source with
    RepVGGBlock added to base_modules, in a copied globals dict carrying the
    class.
    """
    import inspect

    ref = load_reference()
    if ref is None:
        return None
    import ultralytics.nn.tasks as T
    from ultralytics.nn.modules.block import RepVGGBlock

    if getattr(T, "_repvgg_patched", False):
        return T
    src = inspect.getsource(T.parse_model)
    marker = "            Conv,\n"
    assert marker in src, "reference parse_model source changed; update the shim"
    src = src.replace(marker, marker + "            RepVGGBlock,\n", 1)
    ns = dict(vars(T))
    ns["RepVGGBlock"] = RepVGGBlock
    exec(src, ns)  # noqa: S102 - dev-time test scaffolding
    T.parse_model = ns["parse_model"]
    T.RepVGGBlock = RepVGGBlock
    T._repvgg_patched = True
    return T
