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


def _epoch_metrics(trainer):
    return {**getattr(trainer, "label_loss_items_dict", {}), **(trainer.metrics or {})}


def comet_callbacks():
    """Comet ML logging, if comet_ml is importable (reference callbacks/comet.py)."""
    try:
        import comet_ml  # noqa: F401
    except ImportError:
        return None
    import comet_ml

    state = {}

    def on_pretrain_routine_start(trainer):
        state["exp"] = comet_ml.Experiment(project_name=str(trainer.args.project or "drone_yolo_tpu"))
        state["exp"].log_parameters(vars(trainer.args))

    def on_fit_epoch_end(trainer):
        if "exp" in state:
            state["exp"].log_metrics(
                {k: v for k, v in _epoch_metrics(trainer).items() if isinstance(v, (int, float))},
                epoch=trainer.epoch,
            )

    def on_train_end(trainer):
        if "exp" in state:
            state["exp"].end()

    return {
        "on_pretrain_routine_start": on_pretrain_routine_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }


def clearml_callbacks():
    """ClearML logging, if clearml is importable (reference callbacks/clearml.py)."""
    try:
        from clearml import Task  # noqa: F401
    except ImportError:
        return None
    from clearml import Task

    state = {}

    def on_pretrain_routine_start(trainer):
        state["task"] = Task.init(
            project_name=str(trainer.args.project or "drone_yolo_tpu"), task_name=str(trainer.args.name or "train")
        )
        state["task"].connect(vars(trainer.args))

    def on_fit_epoch_end(trainer):
        if "task" in state:
            logger = state["task"].get_logger()
            for k, v in _epoch_metrics(trainer).items():
                if isinstance(v, (int, float)):
                    logger.report_scalar("train", k, float(v), iteration=trainer.epoch)

    def on_train_end(trainer):
        if "task" in state:
            state["task"].close()

    return {
        "on_pretrain_routine_start": on_pretrain_routine_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }


def dvc_callbacks():
    """DVCLive logging, if dvclive is importable (reference callbacks/dvc.py)."""
    try:
        import dvclive  # noqa: F401
    except ImportError:
        return None
    import dvclive

    state = {}

    def on_pretrain_routine_start(trainer):
        state["live"] = dvclive.Live(str(Path(trainer.save_dir) / "dvclive"), save_dvc_exp=False)

    def on_fit_epoch_end(trainer):
        live = state.get("live")
        if live is not None:
            for k, v in _epoch_metrics(trainer).items():
                if isinstance(v, (int, float)):
                    live.log_metric(k, float(v))
            live.next_step()

    def on_train_end(trainer):
        if state.get("live") is not None:
            state["live"].end()

    return {
        "on_pretrain_routine_start": on_pretrain_routine_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }


def neptune_callbacks():
    """Neptune logging, if neptune is importable (reference callbacks/neptune.py)."""
    try:
        import neptune  # noqa: F401
    except ImportError:
        return None
    import neptune

    state = {}

    def on_pretrain_routine_start(trainer):
        state["run"] = neptune.init_run(name=str(trainer.args.name or "train"))
        state["run"]["configuration/hyperparameters"] = {k: str(v) for k, v in vars(trainer.args).items()}

    def on_fit_epoch_end(trainer):
        run = state.get("run")
        if run is not None:
            for k, v in _epoch_metrics(trainer).items():
                if isinstance(v, (int, float)):
                    run[k].append(float(v), step=trainer.epoch)

    def on_train_end(trainer):
        if state.get("run") is not None:
            state["run"].stop()

    return {
        "on_pretrain_routine_start": on_pretrain_routine_start,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_train_end": on_train_end,
    }


def raytune_callbacks():
    """Ray Tune session reporting, if ray.tune is active (reference callbacks/raytune.py)."""
    try:
        from ray import train as ray_train
        from ray import tune  # noqa: F401
    except ImportError:
        return None

    def on_fit_epoch_end(trainer):
        try:
            from ray.train._internal.session import get_session

            if get_session() is None:
                return
        except Exception:  # noqa: BLE001 - session introspection is best-effort
            pass
        metrics = {k: float(v) for k, v in _epoch_metrics(trainer).items() if isinstance(v, (int, float))}
        metrics["epoch"] = trainer.epoch
        ray_train.report(metrics)

    return {"on_fit_epoch_end": on_fit_epoch_end}


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


def hub_callbacks():
    """Stream training to a HUB backend when DYT_HUB_API_ROOT is configured
    (reference hub/__init__.py + utils/callbacks/hub.py: on_fit_epoch_end ->
    metric queue upload, on_model_save -> checkpoint upload, on_train_end ->
    final model). No endpoint -> pack disabled."""
    import os

    if not os.environ.get("DYT_HUB_API_ROOT"):
        return None

    def on_pretrain_routine_end(trainer):
        from drone_yolo_tpu.hub.session import HUBTrainingSession

        trainer.hub_session = HUBTrainingSession(identifier=str(getattr(trainer.args, "model", "") or trainer.args.name))

    def on_fit_epoch_end(trainer):
        s = getattr(trainer, "hub_session", None)
        if s:
            metrics = {**getattr(trainer, "label_loss_items_dict", {}), **(trainer.metrics or {})}
            s.upload_metrics(trainer.epoch, {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))})

    def on_model_save(trainer):
        s = getattr(trainer, "hub_session", None)
        if s:
            last = Path(trainer.wdir) / "last.npz"
            if last.exists():
                s.upload_model(trainer.epoch, str(last), is_best=trainer.fitness == getattr(trainer, "best_fitness", None))

    def on_train_end(trainer):
        s = getattr(trainer, "hub_session", None)
        if s:
            best = Path(trainer.wdir) / "best.npz"
            if best.exists():
                s.upload_model(trainer.epoch, str(best), is_best=True, final=True, map_=float(getattr(trainer, "best_fitness", 0.0) or 0.0))
            s.stop()

    return {
        "on_pretrain_routine_end": on_pretrain_routine_end,
        "on_fit_epoch_end": on_fit_epoch_end,
        "on_model_save": on_model_save,
        "on_train_end": on_train_end,
    }
