"""Checkpoint I/O: single-file .npz with embedded model config + pytree weights.

Capability parity with the reference's torch .pt checkpoints (trainer.py:514-547:
{epoch, best_fitness, ema, updates, optimizer, train_args, ...}) — but as flat
npz arrays + a JSON header instead of pickles: portable, mmap-able, and free of
arbitrary-code-execution on load. Full train-state checkpoints for resume are
written by the trainer as `resume_state.npz` (params/optimizer/EMA/step via the
same flatten_tree helpers below, `engine/trainer.py:save_model`); this module
covers the weights+metadata artifact used by predict/val/export
("last.npz"/"best.npz"). Orbax is deliberately NOT a dependency: single-host
npz keeps artifacts inspectable and the zero-dep load path; a multi-host
deployment would swap `flatten_tree`->`ocp.StandardCheckpointer` in one place.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

import numpy as np


def flatten_tree(tree: dict, prefix: str = "") -> dict:
    """Flatten a nested dict pytree to {'a/b/c': leaf} for npz serialization."""
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: dict) -> dict:
    """Inverse of flatten_tree: {'a/b/c': leaf} -> nested dict pytree."""
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_checkpoint(path, model, variables, train_args: dict | None = None, meta: dict | None = None):
    """Save weights + config to `path` (.npz appended if missing)."""
    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    header = {
        "format": "drone_yolo_tpu.v1",
        "task": model.task,
        "yaml": {k: v for k, v in model.yaml.items() if k != "yaml_file"},
        "names": {int(k): v for k, v in model.names.items()},
        "stride": [float(s) for s in model.stride],
        "train_args": _jsonable(train_args or {}),
        "date": datetime.now(timezone.utc).isoformat(),
        **_jsonable(meta or {}),
    }
    flat = flatten_tree(variables)
    np.savez(path, __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8), **flat)
    return path


def load_checkpoint(path, model=None):
    """Load a checkpoint; returns (model, variables, header). Rebuilds the model
    from the embedded yaml unless one is passed in."""
    from drone_yolo_tpu.nn.model import TASK2MODELCLASS

    path = Path(path)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["__header__"]).decode())
    variables = unflatten_tree({k: data[k] for k in data.files if k != "__header__"})
    if model is None:
        cls = TASK2MODELCLASS[header.get("task", "detect")]
        model = cls(dict(header["yaml"]))
        model.names = {int(k): v for k, v in header.get("names", {}).items()}
        if header.get("stride"):
            model.stride = np.array(header["stride"], dtype=np.float32)
            if hasattr(model.head, "stride"):
                model.head.stride = [int(s) for s in header["stride"]]
    return model, variables, header


def _jsonable(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, Path):
            v = str(v)
        elif isinstance(v, np.generic):
            v = v.item()
        elif isinstance(v, np.ndarray):
            v = v.tolist()
        try:
            json.dumps(v)
        except TypeError:
            v = str(v)
        out[k] = v
    return out


def strip_optimizer(path):
    """Parity shim (reference torch_utils.py:553): weights-only npz checkpoints
    carry no optimizer state, so this just validates the artifact."""
    model, variables, header = load_checkpoint(path)
    return save_checkpoint(path, model, variables, train_args=header.get("train_args", {}))
