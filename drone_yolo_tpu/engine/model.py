"""`YOLO` model facade: one object routing train/val/predict/export/track.

Parity with reference `ultralytics/engine/model.py:29` (Model) + the task_map
registry pattern of `ultralytics/models/yolo/model.py:26-59`. Weights are Orbax/
npz pytree checkpoints instead of torch pickles.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from drone_yolo_tpu.cfg import TASK2DATA, get_cfg, get_save_dir
from drone_yolo_tpu.nn.model import TASK2MODELCLASS, guess_model_task
from drone_yolo_tpu.utils import DEFAULT_CFG_DICT, LOGGER


class YOLO:
    """User-facing facade over task models, trainers, validators, predictors."""

    MODEL_CLASS = None  # subclass hook (YOLOWorld, RTDETR)

    def __init__(self, model="yolov8n.yaml", task: str | None = None, verbose: bool = False):
        self.overrides: dict = {}
        self.ckpt = None
        self.variables = None
        self.predictor = None
        self.model_name = str(model)

        if isinstance(model, (list, tuple)):
            self._load_ensemble(model, task=task)
            return
        model = str(model).strip()

        if model.endswith((".yaml", ".yml")):
            self._new(model, task=task, verbose=verbose)
        elif self._is_artifact(model):
            self._load_backend(model, task=task)
        else:
            self._load(model, task=task)

    @staticmethod
    def _is_artifact(model: str) -> bool:
        """Export artifacts and serving URLs route through AutoBackend (the
        reference predictor's primary path, autobackend.py:54): predict/val
        work on them; train does not."""
        if model.startswith(("http://", "https://", "grpc://")):
            return True
        if model.endswith((".onnx", ".tflite", ".stablehlo")):
            return True
        from pathlib import Path as _P

        return _P(model).is_dir() and (_P(model) / "saved_model.pb").exists()

    # -- construction -------------------------------------------------------
    def _new(self, cfg: str, task: str | None = None, verbose: bool = False):
        self.task = task or guess_model_task(cfg)
        cls = self.MODEL_CLASS or TASK2MODELCLASS[self.task]
        self.model = cls(cfg, verbose=verbose)
        self.cfg = cfg
        self.overrides["model"] = cfg
        self.overrides["task"] = self.task
        self.variables = None  # lazily initialized

    def _load(self, weights: str, task: str | None = None):
        """Load a saved checkpoint (directory with config.yaml + params, or .npz)."""
        from drone_yolo_tpu.engine.checkpoint import load_checkpoint

        self.model, self.variables, self.ckpt = load_checkpoint(weights)
        self.task = task or self.model.task
        self.overrides = dict(self.ckpt.get("train_args", {})) if self.ckpt else {}
        self.overrides["model"] = weights
        self.overrides["task"] = self.task
        self.cfg = weights

    def _load_backend(self, path: str, task: str | None = None):
        """Wrap an exported artifact (onnx/tflite/stablehlo/savedmodel/URL) so
        predict() and val() run through AutoBackend, like the reference's
        YOLO('best.onnx') flow."""
        from drone_yolo_tpu.nn.autobackend import AutoBackend

        self.backend = AutoBackend(path)
        self.model = None
        self.task = task or self.backend.task or "detect"
        self.overrides = {"model": path, "task": self.task}
        self.cfg = path

    def _load_ensemble(self, weights, task: str | None = None):
        """Load several checkpoints as an NMS ensemble (reference
        nn/tasks.py:684 Ensemble / :865 attempt_load_weights)."""
        from drone_yolo_tpu.nn.model import attempt_load_weights

        self.model, self.variables = attempt_load_weights(weights)
        self.task = task or self.model.task
        self.overrides = {"model": list(map(str, weights)), "task": self.task}
        self.cfg = self.model_name = ",".join(map(str, weights))

    def ensure_variables(self, imgsz: int = 640, seed: int = 0):
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(seed), imgsz=imgsz)
        return self.variables

    @property
    def names(self):
        return self.model.names

    @property
    def stride(self):
        return self.model.stride

    # -- modes ---------------------------------------------------------------
    # -- callback registry (reference model.py:980-1004) ----------------------
    def add_callback(self, event: str, func) -> None:
        """Register a user callback, forwarded to every trainer/validator/
        predictor this facade creates (reference model.py add_callback)."""
        self._user_callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str) -> None:
        self._user_callbacks[event] = []

    def reset_callbacks(self) -> None:
        self._user_callbacks = {}

    @property
    def _user_callbacks(self):
        if not hasattr(self, "_user_cb_store"):
            self._user_cb_store = {}
        return self._user_cb_store

    @_user_callbacks.setter
    def _user_callbacks(self, v):
        self._user_cb_store = v

    def _forward_callbacks(self, component) -> None:
        for event, fns in self._user_callbacks.items():
            for fn in fns:
                component.add_callback(event, fn)

    def reset_weights(self):
        """Drop loaded weights and re-initialize randomly (reference
        model.py reset_weights). Returns self."""
        self.variables = None
        self.ckpt = None
        return self

    @property
    def device(self):
        import jax

        return jax.devices()[0]

    def predict(self, source=None, stream: bool = False, **kwargs):
        from drone_yolo_tpu.models.yolo import TASK_MAP

        custom = {"conf": 0.25, "batch": 1, "save": False, "mode": "predict"}
        args = {**self.overrides, **custom, **kwargs}
        pred_cls = TASK_MAP[self.task]["predictor"]
        if self.predictor is None or self.predictor.__class__ is not pred_cls:
            self.predictor = pred_cls(overrides=args)
            self.predictor.setup_model(self)
            self._forward_callbacks(self.predictor)
            for event, fn in getattr(self, "_pending_tracker_callbacks", []):
                self.predictor.add_callback(event, fn)
        else:
            self.predictor.args = get_cfg(self.predictor.args, kwargs)
        return self.predictor(source=source, stream=stream)

    def __call__(self, source=None, stream: bool = False, **kwargs):
        return self.predict(source, stream, **kwargs)

    def track(self, source=None, stream: bool = False, persist: bool = False, **kwargs):
        from drone_yolo_tpu.trackers.track import register_tracker

        if not hasattr(self, "_tracker_registered"):
            register_tracker(self, persist)
            self._tracker_registered = True
        kwargs["conf"] = kwargs.get("conf") or 0.1
        kwargs["mode"] = "track"
        return self.predict(source=source, stream=stream, **kwargs)

    def val(self, data=None, **kwargs):
        from drone_yolo_tpu.models.yolo import TASK_MAP

        custom = {"rect": True, "mode": "val"}  # reference model.py:637 method default
        args = {**self.overrides, **custom, **kwargs}
        if data is not None:
            args["data"] = data
        validator_cls = TASK_MAP[self.task]["validator"]
        validator = validator_cls(args=args)
        self._forward_callbacks(validator)
        validator(model=getattr(self, "backend", None) or self)
        self.metrics = validator.metrics
        return validator.metrics

    def train(self, trainer=None, **kwargs):
        from drone_yolo_tpu.models.yolo import TASK_MAP

        overrides = {**self.overrides, **kwargs, "mode": "train"}
        if not overrides.get("data"):
            raise AttributeError("dataset required: pass data=...")
        trainer_cls = trainer or TASK_MAP[self.task]["trainer"]
        self.trainer = trainer_cls(overrides=overrides)
        self._forward_callbacks(self.trainer)
        self.trainer.model_facade = self
        self.trainer.train()
        # adopt best/last weights after training
        if self.trainer.best_vars is not None:
            self.variables = self.trainer.best_vars
        return getattr(self.trainer, "metrics", None)

    def tune(self, iterations: int = 10, **kwargs):
        from drone_yolo_tpu.engine.tuner import Tuner

        args = {**self.overrides, **kwargs}
        return Tuner(args=args)(model=self, iterations=iterations)

    def embed(self, source=None, layers=None, **kwargs):
        """Return pooled feature embeddings from intermediate layers
        (reference model.py embed mode)."""
        import jax
        import jax.numpy as jnp

        from drone_yolo_tpu.nn import modules as M

        layers = layers or [len(self.model.layers) - 2]
        self.ensure_variables()
        net = self.model

        @jax.jit
        def feat_fn(variables, x):
            ctx = M.Ctx(train=False, dtype=jnp.float32)
            y, out = [], x
            feats = {}
            for spec in net.layers:
                f = spec.f
                xin = out if f == -1 else (y[f] if isinstance(f, int) else [out if j == -1 else y[j] for j in f])
                out = spec.module(variables.get(str(spec.i), {}), xin, ctx)
                y.append(out if spec.i in net.save else None)
                if spec.i in layers and not isinstance(out, (list, tuple)):
                    feats[spec.i] = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
            return feats

        from drone_yolo_tpu.ops.letterbox import letterbox_np
        import numpy as np

        imgs = source if isinstance(source, list) else [source]
        processed = [letterbox_np(im, (self.overrides.get("imgsz", 640),) * 2)[0][:, :, ::-1] for im in imgs]
        x = jnp.asarray(np.stack(processed).astype(np.float32) / 255.0)
        return feat_fn(self.variables, x)

    def export(self, **kwargs):
        from drone_yolo_tpu.engine.exporter import Exporter

        args = {**self.overrides, **kwargs, "mode": "export"}
        return Exporter(overrides=args)(self)

    def benchmark(self, **kwargs):
        from drone_yolo_tpu.utils.benchmarks import benchmark

        return benchmark(model=self, **kwargs)

    def fuse(self):
        """Fold BN + RepVGG branches into plain convs (inference weight transform)."""
        self.ensure_variables()
        self.variables = self.model.fuse(self.variables)
        return self

    def save(self, path: str | Path):
        from drone_yolo_tpu.engine.checkpoint import save_checkpoint

        save_checkpoint(path, self.model, self.ensure_variables(), train_args=self.overrides)

    def load(self, weights):
        """Transfer matching weights into this model (reference Model.load /
        intersect_dicts semantics: leaves with matching path+shape copy over,
        the rest keep their init — enables backbone transfer across tasks)."""
        from drone_yolo_tpu.engine.checkpoint import load_checkpoint
        from drone_yolo_tpu.nn.model import intersect_tree
        from drone_yolo_tpu.utils import LOGGER

        _, src, self.ckpt = load_checkpoint(weights, model=None)
        self.ensure_variables()
        self.variables, copied, total = intersect_tree(self.variables, src)
        LOGGER.info(f"transferred {copied}/{total} weights from {weights}")
        return self

    def info(self, verbose: bool = True):
        self.model.info(self.variables)
