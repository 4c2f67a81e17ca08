"""Experiment logger integrations wired to the callback bus.

Capability parity with `ultralytics/utils/callbacks/{tensorboard,...}.py`: each
integration returns an {event: fn} pack, or None when its dependency is absent.
CSV logging (results.csv) is always available.
"""

from __future__ import annotations

from pathlib import Path

from drone_yolo_tpu.utils import LOGGER


def csv_callbacks():
    """Per-epoch metrics -> results.csv (reference trainer.py:663 save_metrics)."""

    def on_fit_epoch_end(trainer):
        metrics = {**getattr(trainer, "label_loss_items_dict", {}), **(trainer.metrics or {})}
        csv_path = Path(trainer.save_dir) / "results.csv"
        keys = ["epoch"] + list(metrics.keys())
        line = [trainer.epoch] + [f"{v:.5f}" if isinstance(v, float) else v for v in metrics.values()]
        header = not csv_path.exists()
        with open(csv_path, "a", encoding="utf-8") as f:
            if header:
                f.write(",".join(str(k) for k in keys) + "\n")
            f.write(",".join(str(v) for v in line) + "\n")

    return {"on_fit_epoch_end": on_fit_epoch_end}


def wandb_callbacks():
    """Weights & Biases logging, if wandb is importable (reference callbacks/wb.py)."""
    try:
        import wandb  # noqa: F401
    except ImportError:
        return None
    import wandb

    state = {}

    def on_pretrain_routine_start(trainer):
        state["run"] = wandb.init(project=str(trainer.args.project or "drone_yolo_tpu"), name=trainer.args.name, config=vars(trainer.args))

    def on_fit_epoch_end(trainer):
        if "run" in state:
            wandb.log({**getattr(trainer, "label_loss_items_dict", {}), **(trainer.metrics or {})}, step=trainer.epoch)

    def on_train_end(trainer):
        if "run" in state:
            state["run"].finish()

    return {"on_pretrain_routine_start": on_pretrain_routine_start, "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def mlflow_callbacks():
    """MLflow logging, if mlflow is importable (reference callbacks/mlflow.py)."""
    try:
        import mlflow  # noqa: F401
    except ImportError:
        return None
    import mlflow

    def on_pretrain_routine_end(trainer):
        mlflow.set_experiment(str(trainer.args.project or "drone_yolo_tpu"))
        mlflow.start_run(run_name=trainer.args.name)
        mlflow.log_params({k: str(v) for k, v in vars(trainer.args).items()})

    def on_fit_epoch_end(trainer):
        metrics = {**getattr(trainer, "label_loss_items_dict", {}), **(trainer.metrics or {})}
        mlflow.log_metrics({k.replace("(", "").replace(")", "").replace("/", "_"): float(v) for k, v in metrics.items() if isinstance(v, (int, float))}, step=trainer.epoch)

    def on_train_end(trainer):
        mlflow.end_run()

    return {"on_pretrain_routine_end": on_pretrain_routine_end, "on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}


def tensorboard_callbacks():
    """TensorBoard scalars, if tensorboard is importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter  # torch cpu ships it
    except Exception:  # noqa: BLE001
        return None

    state = {}

    def _writer(trainer):
        if "w" not in state:
            state["w"] = SummaryWriter(str(trainer.save_dir))
        return state["w"]

    def on_fit_epoch_end(trainer):
        w = _writer(trainer)
        for k, v in {**getattr(trainer, "label_loss_items_dict", {}), **(trainer.metrics or {})}.items():
            try:
                w.add_scalar(k, float(v), trainer.epoch)
            except (TypeError, ValueError):
                pass

    def on_train_end(trainer):
        if "w" in state:
            state["w"].close()

    return {"on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}
