"""Callback bus: 26 named lifecycle events fired by trainer/validator/predictor.

Capability parity with `ultralytics/utils/callbacks/base.py:144-217` (default
callback dict, add_integration_callbacks). Integrations (TensorBoard, CSV, ...)
register plain functions per event.
"""

from __future__ import annotations

from collections import defaultdict
from copy import deepcopy

# fmt: off
EVENTS = [
    # trainer
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    # validator
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    # predictor
    "on_predict_start", "on_predict_batch_start", "on_predict_postprocess_end",
    "on_predict_batch_end", "on_predict_end",
    # exporter
    "on_export_start", "on_export_end",
]
# fmt: on


def get_default_callbacks() -> dict:
    """Fresh event->list-of-functions registry."""
    return defaultdict(list, {e: [] for e in EVENTS})


def add_integration_callbacks(instance) -> None:
    """Attach available logger integrations (reference callbacks/base.py:187)."""
    from drone_yolo_tpu.utils.loggers import (
        clearml_callbacks,
        comet_callbacks,
        csv_callbacks,
        dvc_callbacks,
        hub_callbacks,
        mlflow_callbacks,
        neptune_callbacks,
        raytune_callbacks,
        tensorboard_callbacks,
        wandb_callbacks,
    )

    packs = (
        csv_callbacks(),
        tensorboard_callbacks(),
        wandb_callbacks(),
        mlflow_callbacks(),
        comet_callbacks(),
        clearml_callbacks(),
        dvc_callbacks(),
        neptune_callbacks(),
        raytune_callbacks(),
        hub_callbacks(),
    )
    for pack in packs:
        if not pack:
            continue
        for event, fn in pack.items():
            if fn not in instance.callbacks[event]:
                instance.callbacks[event].append(fn)


class CallbackMixin:
    """Run/registration helpers shared by trainer/validator/predictor/exporter."""

    def run_callbacks(self, event: str):
        for cb in self.callbacks.get(event, []):
            cb(self)

    def add_callback(self, event: str, func):
        self.callbacks[event].append(func)
