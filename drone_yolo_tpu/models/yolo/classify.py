"""Classification task triple (reference models/yolo/classify/{train,val,predict}.py)."""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.data.build import DataLoader
from drone_yolo_tpu.data.dataset import ClassificationDataset
from drone_yolo_tpu.data.utils import check_cls_dataset
from drone_yolo_tpu.engine.predictor import BasePredictor
from drone_yolo_tpu.engine.results import Results
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.engine.validator import BaseValidator
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.utils import LOGGER, TQDM
from drone_yolo_tpu.utils.loss import v8ClassificationLoss
from drone_yolo_tpu.utils.metrics import ClassifyMetrics


class ClassificationTrainer(BaseTrainer):
    loss_names = ("loss",)

    def get_dataset(self):
        return check_cls_dataset(self.args.data)

    def build_dataset(self, img_path, mode="train", batch=None):
        return ClassificationDataset(img_path, imgsz=int(self.args.imgsz), augment=mode == "train", fraction=self.args.fraction if mode == "train" else 1.0, hyp=self.args)

    def get_criterion(self):
        return v8ClassificationLoss()

    def get_validator(self):
        return ClassificationValidator(
            args={**vars(self.args), "mode": "val", "plots": False}, save_dir=self.save_dir
        )


class ClassificationValidator(BaseValidator):
    """Top-1/top-5 accuracy over a classification folder dataset."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.metrics = ClassifyMetrics()
        self.args.task = "classify"

    def __call__(self, model=None, variables=None):
        from drone_yolo_tpu.nn.autobackend import AutoBackend

        facade = model
        backend = facade if isinstance(facade, AutoBackend) else getattr(facade, "backend", None)
        imgsz = int(self.args.imgsz)
        if backend is not None:
            self.model = None
            self.variables = None
            nc = backend.nc
        else:
            self.model = facade.model
            if variables is None:
                facade.ensure_variables(imgsz=imgsz)
                variables = self.model.fuse(facade.variables)
            self.variables = variables
            nc = self.model.nc

        if self.dataloader is None:
            data = check_cls_dataset(self.args.data)
            ds = ClassificationDataset(data["val"] or data["train"], imgsz=imgsz, augment=False)
            self.dataloader = DataLoader(ds, batch_size=int(self.args.batch), shuffle=False, drop_last=False)
            self.names = data["names"]

        topk = min(5, nc)
        if backend is not None:

            def fn(_variables, x):
                probs = np.asarray(backend(np.asarray(x, np.float32)))
                top = np.argsort(-probs, axis=1)[:, :topk]
                return None, top

        else:
            model_ = self.model

            @jax.jit
            def fn(variables, x):
                probs = model_.apply(variables, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
                return jax.lax.top_k(probs, topk)

        preds, targets = [], []
        t0 = time.perf_counter()
        n_img = 0
        for batch in TQDM(self.dataloader, desc="val"):
            x = jnp.asarray(batch["img"].astype(np.float32) / 255.0)
            _, top5 = fn(self.variables, x)
            preds.append(np.asarray(top5))
            targets.append(batch["cls"])
            n_img += len(batch["cls"])
        self.pred = preds  # per-batch top-5 indices (reference val.py:46 self.pred)
        self.targets = targets
        self.metrics.process(np.concatenate(targets), np.concatenate(preds))
        self.metrics.speed["inference"] = (time.perf_counter() - t0) / max(n_img, 1) * 1e3
        LOGGER.info(f"top1: {self.metrics.top1:.4f} top5: {self.metrics.top5:.4f}")
        return self.metrics.results_dict


class ClassificationPredictor(BasePredictor):
    """Softmax probabilities per image."""

    def _forward_fn(self, shape):
        key = ("cls", shape)
        if key in self._jit_cache:
            return self._jit_cache[key]

        if self.backend is not None:  # exported artifact: (B, nc) probabilities
            backend = self.backend

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                if isinstance(out, (list, tuple)):
                    out = out[0]
                return jnp.asarray(out), jnp.zeros((np.asarray(x).shape[0],), jnp.int32)

            self._jit_cache[key] = backend_fn
            return backend_fn

        model = self.model

        @jax.jit
        def fn(variables, x):
            probs = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
            return probs, jnp.zeros((x.shape[0],), jnp.int32)

        self._jit_cache[key] = fn
        return fn

    def preprocess(self, imgs):
        """Center-crop resize (no letterbox padding for classification)."""
        import cv2

        out = []
        self.batch_ratio_pad = []
        size = self.imgsz[0]
        for im in imgs:
            h, w = im.shape[:2]
            r = size / min(h, w)
            imr = cv2.resize(im, (round(w * r), round(h * r)))
            top, left = (imr.shape[0] - size) // 2, (imr.shape[1] - size) // 2
            out.append(imr[top : top + size, left : left + size, ::-1])
            self.batch_ratio_pad.append((r, (0, 0)))
        return np.ascontiguousarray(np.stack(out), dtype=np.float32) / 255.0

    def postprocess(self, probs, n_valid, x_shape, orig_imgs, paths):
        probs = np.asarray(probs)
        return [
            Results(im0, path, self.names, probs=probs[i])
            for i, (im0, path) in enumerate(zip(orig_imgs, paths))
        ]
