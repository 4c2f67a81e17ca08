"""Config/flag system: default.yaml merge, per-key validation, CLI entrypoint.

Parity with reference `ultralytics/cfg/__init__.py:50-996` (get_cfg, check_cfg,
get_save_dir, entrypoint) with the same key taxonomy and `k=v` CLI grammar.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path
from types import SimpleNamespace

from drone_yolo_tpu.utils import (
    DEFAULT_CFG,
    DEFAULT_CFG_DICT,
    DEFAULT_CFG_KEYS,
    LOGGER,
    IterableSimpleNamespace,
    colorstr,
    increment_path,
    yaml_load,
    yaml_print,
)

# Task/mode registries (reference cfg/__init__.py:50-67)
TASKS = {"detect", "segment", "classify", "pose", "obb"}
MODES = {"train", "val", "predict", "export", "track", "benchmark"}

TASK2DATA = {
    "detect": "coco8.yaml",
    "segment": "coco8-seg.yaml",
    "classify": "imagenet10",
    "pose": "coco8-pose.yaml",
    "obb": "dota8.yaml",
}
TASK2MODEL = {
    "detect": "yolov8n.yaml",
    "segment": "yolov8n-seg.yaml",
    "classify": "yolov8n-cls.yaml",
    "pose": "yolov8n-pose.yaml",
    "obb": "yolov8n-obb.yaml",
}
TASK2METRIC = {
    "detect": "metrics/mAP50-95(B)",
    "segment": "metrics/mAP50-95(M)",
    "classify": "metrics/accuracy_top1",
    "pose": "metrics/mAP50-95(P)",
    "obb": "metrics/mAP50-95(B)",
}

# Per-key type/range validation groups (reference cfg/__init__.py:147-236)
CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "workspace", "batch"}
CFG_FRACTION_KEYS = {
    "dropout", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
    "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective", "flipud", "fliplr", "bgr",
    "mosaic", "mixup", "copy_paste", "conf", "iou", "fraction", "erasing", "crop_fraction",
}
CFG_INT_KEYS = {
    "epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio", "max_det",
    "vid_stride", "line_width", "nbs", "save_period", "prefetch", "pre_nms_topk", "tp", "sp",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
    "overlap_mask", "val", "save_json", "save_hybrid", "half", "dnn", "plots", "show",
    "save_txt", "save_conf", "save_crop", "save_frames", "show_labels", "show_conf",
    "visualize", "augment", "agnostic_nms", "retina_masks", "show_boxes", "keras",
    "optimize", "int8", "dynamic", "simplify", "nms", "profile", "multi_scale", "spd_stem",
    "zero", "device_aug", "lane_pad",
}


def cfg2dict(cfg) -> dict:
    """Convert a path / dict / namespace config into a plain dict."""
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
    elif isinstance(cfg, SimpleNamespace):
        cfg = vars(cfg)
    return dict(cfg)


def check_cfg(cfg: dict, hard: bool = True) -> None:
    """Validate types and ranges for known config keys, coercing when sensible."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be int or float")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be int or float")
                v = cfg[k] = float(v)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"'{k}={v}' is out of the valid range 0.0-1.0")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be int")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if hard:
                raise TypeError(f"'{k}={v}' must be bool")
            cfg[k] = bool(v)


def get_cfg(cfg=DEFAULT_CFG_DICT, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge defaults + config + overrides into a validated namespace (reference cfg/__init__.py:276)."""
    cfg = cfg2dict(cfg)
    if overrides:
        overrides = cfg2dict(overrides)
        overrides.pop("save_dir", None)
        cfg = {**cfg, **overrides}
    # Base: always layer on top of the full default key set.
    merged = {**DEFAULT_CFG_DICT, **cfg}
    for k in ("project", "name"):
        if isinstance(merged.get(k), (int, float)):
            merged[k] = str(merged[k])
    if merged.get("name") == "model":
        merged["name"] = str(merged.get("model", "")).split(".")[0]
    check_cfg(merged)
    return IterableSimpleNamespace(**merged)


def get_save_dir(args, name: str | None = None) -> Path:
    """runs/{task}/{name} with auto-increment (reference cfg/__init__.py:386)."""
    if getattr(args, "save_dir", None):
        return Path(args.save_dir)
    project = args.project or Path("runs") / args.task
    name = name or args.name or f"{args.mode}"
    return increment_path(Path(project) / name, exist_ok=getattr(args, "exist_ok", False))


def merge_equals_args(args: list[str]) -> list[str]:
    """Merge fragmented 'k = v' CLI tokens into 'k=v'."""
    out = []
    for i, arg in enumerate(args):
        if arg == "=" and 0 < len(out):
            out[-1] += f"={args[i + 1] if i + 1 < len(args) else ''}"
        elif arg.endswith("=") and i + 1 < len(args) and "=" not in args[i + 1]:
            out.append(f"{arg}{args[i + 1]}")
        elif arg.startswith("=") and out:
            out[-1] += arg
        elif "=" in arg or not (out and out[-1].endswith("=")):
            out.append(arg)
    return out


def smart_value(v: str):
    """Parse a CLI string value to its python type."""
    lower = v.lower()
    if lower == "none":
        return None
    if lower == "true":
        return True
    if lower == "false":
        return False
    try:
        import ast

        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def entrypoint(debug: str = "") -> None:
    """CLI: `yolo-tpu <task> <mode> k=v ...` (reference cfg/__init__.py:825)."""
    args = (debug.split(" ") if debug else sys.argv)[1:]
    if not args:
        LOGGER.info(f"usage: yolo-tpu TASK MODE ARGS\n  TASK in {sorted(TASKS)}\n  MODE in {sorted(MODES)}\n  ARGS as k=v pairs, see cfg/default.yaml")
        return

    special = {
        "help": lambda: LOGGER.info("yolo-tpu <task> <mode> k=v ..."),
        "version": lambda: LOGGER.info(__import__("drone_yolo_tpu").__version__),
        "settings": lambda: LOGGER.info(dict(__import__("drone_yolo_tpu.utils", fromlist=["get_settings"]).get_settings())),
        "cfg": lambda: yaml_print(DEFAULT_CFG_DICT),
        "copy-cfg": copy_default_cfg,
        "checks": lambda: LOGGER.info(collect_system_info()),
    }
    overrides = {}
    task, mode = None, None
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            if k == "cfg" and v:
                overrides = {**yaml_load(v), **overrides}
            else:
                overrides[k] = smart_value(v)
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        elif a.lower() in special:
            special[a.lower()]()
            return
        else:
            # bare model path shorthand
            if a.endswith((".yaml", ".yml", ".npz")) or "/" in a:
                overrides["model"] = a
            else:
                raise SyntaxError(f"'{a}' is not a valid argument. Use k=v pairs, a task {sorted(TASKS)}, or a mode {sorted(MODES)}.")

    mode = mode or overrides.pop("mode", None) or DEFAULT_CFG.mode or "predict"
    if mode not in MODES:
        raise ValueError(f"invalid mode={mode}, must be one of {sorted(MODES)}")
    task = task or overrides.pop("task", None)
    model = overrides.pop("model", None) or (TASK2MODEL.get(task) if task else "yolov8n.yaml")

    from drone_yolo_tpu.engine.model import YOLO

    ymodel = YOLO(model, task=task)
    if mode in {"predict", "track"} and "source" not in overrides:
        from drone_yolo_tpu.utils import ASSETS

        overrides["source"] = str(ASSETS)
        LOGGER.warning(f"'source' argument is missing, using default source {overrides['source']}")
    if mode in {"train", "val"} and "data" not in overrides and "resume" not in overrides:
        overrides["data"] = TASK2DATA.get(task or ymodel.task, "coco8.yaml")
        LOGGER.warning(f"'data' argument is missing, using default data {overrides['data']}")

    getattr(ymodel, mode)(**overrides)


def copy_default_cfg() -> None:
    """Copy default.yaml next to cwd for user editing."""
    new_file = Path.cwd() / "default_copy.yaml"
    shutil.copy2(Path(__file__).parent / "default.yaml", new_file)
    LOGGER.info(f"{colorstr('green', 'copied')} default.yaml -> {new_file}")


def collect_system_info() -> str:
    """Basic environment report (reference checks.collect_system_info analog)."""
    import platform

    import jax

    lines = [
        f"python {platform.python_version()}",
        f"jax {jax.__version__}",
        f"devices {[str(d) for d in jax.devices()]}",
        f"default backend {jax.default_backend()}",
    ]
    return "\n".join(lines)
