"""Hyperparameter tuner: mutation-based evolution over short train runs.

Capability parity with `ultralytics/engine/tuner.py:33` (Tuner): gaussian
mutation of a bounded hyperparameter search space, fitness from the validator,
best-genome tracking in tune_results.csv. Runs in-process (no subprocess respawn
— a jit world needs no process isolation per trial).
"""

from __future__ import annotations

import random
import shutil
import time
from pathlib import Path

import numpy as np

from drone_yolo_tpu.cfg import get_cfg, get_save_dir
from drone_yolo_tpu.utils import LOGGER, yaml_save

# search space: (min, max[, gain]) — reference tuner.py:80
DEFAULT_SPACE = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.0001, 0.1),
    "momentum": (0.7, 0.98, 0.3),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (1.0, 20.0),
    "cls": (0.2, 4.0),
    "dfl": (0.4, 6.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.95),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
    "copy_paste": (0.0, 1.0),
}


class Tuner:
    """Mutation-based hyperparameter evolution over repeated train runs (reference engine/tuner.py:33)."""
    def __init__(self, args=None, space: dict | None = None, _callbacks=None):
        self.space = space or dict(DEFAULT_SPACE)
        self.args = get_cfg(overrides=args or {})
        self.tune_dir = get_save_dir(self.args, name="tune")
        self.results_csv = self.tune_dir / "tune_results.csv"

    def _mutate(self, parent: dict, mutation: float = 0.8, sigma: float = 0.2) -> dict:
        """Gaussian-mutate the parent genome within bounds (reference tuner.py:120)."""
        rng = np.random.default_rng(int(time.time() * 1e6) % 2**31)
        genome = {}
        while True:
            changed = False
            for k, bounds in self.space.items():
                lo, hi = bounds[0], bounds[1]
                gain = bounds[2] if len(bounds) > 2 else 1.0
                v = float(parent.get(k, (lo + hi) / 2))
                if rng.random() < mutation:
                    v *= 1.0 + rng.normal(0, sigma) * gain
                    changed = True
                genome[k] = float(min(max(v, lo), hi))
            if changed:
                return genome

    def __call__(self, model=None, iterations: int = 10, **train_kwargs):
        """Evolve hyperparameters over `iterations` short trainings."""
        from drone_yolo_tpu import YOLO

        self.tune_dir.mkdir(parents=True, exist_ok=True)
        best_fitness, best_genome = -1.0, None
        history = []
        parent = {k: getattr(self.args, k) for k in self.space if hasattr(self.args, k)}

        for i in range(iterations):
            genome = self._mutate(best_genome or parent) if i else dict(parent)
            LOGGER.info(f"Tuner iteration {i + 1}/{iterations}: {genome}")
            overrides = {**vars(self.args), **train_kwargs, **genome}
            overrides.pop("save_dir", None)
            overrides["name"] = f"trial{i}"
            overrides["project"] = str(self.tune_dir)
            overrides["exist_ok"] = True
            overrides["plots"] = False
            try:
                facade = YOLO(overrides.get("model") or "yolov8n.yaml")
                facade.train(**{k: v for k, v in overrides.items() if k not in ("model", "mode", "save_dir")})
                fitness = float((facade.trainer.metrics or {}).get("fitness", 0.0))
            except Exception as e:  # noqa: BLE001 - a failed trial scores 0 like the reference
                LOGGER.warning(f"trial {i} failed: {e}")
                fitness = 0.0
            history.append((fitness, genome))
            if fitness > best_fitness:
                best_fitness, best_genome = fitness, genome
            header = not self.results_csv.exists()
            with open(self.results_csv, "a", encoding="utf-8") as f:
                if header:
                    f.write("fitness," + ",".join(self.space) + "\n")
                f.write(f"{fitness}," + ",".join(str(genome[k]) for k in self.space) + "\n")

        yaml_save(self.tune_dir / "best_hyperparameters.yaml", best_genome or parent)
        LOGGER.info(f"Tuner done: best fitness {best_fitness} -> {self.tune_dir / 'best_hyperparameters.yaml'}")
        return best_genome
