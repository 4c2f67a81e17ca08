"""Trainer: SPMD data-parallel training loop over a device mesh.

Capability parity with `ultralytics/engine/trainer.py:59-825` (BaseTrainer):
warmup lr/momentum interpolation, nbs-based gradient accumulation, global-norm
clipping, EMA, close-mosaic, per-epoch validation + fitness/best tracking, CSV
metrics, checkpointing with EMA-first resume semantics, early stopping.

TPU re-design (vs the reference's DDP machinery, SURVEY.md §2.8):
* ONE jitted train step contains forward, loss, backward, grad-accumulation,
  clipping, optimizer, EMA, and BN-stat merge — XLA fuses the lot; the gradient
  all-reduce over the "data" mesh axis is inserted by the SPMD partitioner. No
  launcher subprocess, no NCCL process group, no loss x world_size scaling.
* Scalars that change per batch (lr, momentum) enter as device scalars, so the
  warmup schedule never recompiles anything.
* bf16 activations by default (no GradScaler — bf16 keeps fp32's exponent).
* State lives in one donated pytree: params, momentum, EMA, accum grads.
"""

from __future__ import annotations

import math
import time
from functools import partial
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.cfg import get_cfg, get_save_dir
from drone_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from drone_yolo_tpu.data.utils import check_cls_dataset, check_det_dataset
from drone_yolo_tpu.engine.checkpoint import save_checkpoint
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.parallel.mesh import make_mesh, place_state, replicate, shard_batch
from drone_yolo_tpu.utils import LOGGER, TQDM, colorstr, yaml_save
from drone_yolo_tpu.utils.callbacks import CallbackMixin, add_integration_callbacks, get_default_callbacks
from drone_yolo_tpu.utils.ema import EarlyStopping, ema_update
from drone_yolo_tpu.utils.loss import v8DetectionLoss
from drone_yolo_tpu.utils.optimizer import (
    adamw_step,
    auto_optimizer,
    build_lr_fn,
    clip_global_norm,
    init_adam,
    init_momentum,
    label_tree,
    sgd_step,
)


def compute_scale_buckets(imgsz: int, stride: int, sp: int = 1, multi_scale: bool = False) -> list:
    """Static multi-scale size buckets (reference resizes 0.5-1.5x per batch,
    detect/train.py:60 — dynamic shapes would force recompiles on TPU, so we
    bucket). Under spatial partitioning (sp > 1) every bucket must also
    satisfy the >=2-rows-per-shard guard (size % (sp*64) == 0, _setup_train):
    stride-aligned-only buckets could give a scale whose stride-32 map has <2
    rows per "space" shard — the regime where XLA GSPMD mis-reduces the
    chained-conv backward (tests/test_sp.py probe)."""
    if not multi_scale:
        return [int(imgsz)]
    align = sp * 64 if sp > 1 else stride
    raw = [imgsz * s for s in (0.67, 0.83, 1.0, 1.17, 1.33)]
    return sorted({max(int(round(v / align)) * align, align) for v in raw})


class BaseTrainer(CallbackMixin):
    """Detection trainer (subclasses specialize dataset/loss/validator)."""

    loss_names = ("box_loss", "cls_loss", "dfl_loss")

    def __init__(self, cfg=None, overrides=None, _callbacks=None):
        self.args = get_cfg(cfg or {}, overrides)
        self.args.task = self.args.task or "detect"
        self.save_dir = get_save_dir(self.args)
        self.wdir = self.save_dir / "weights"
        self.args.name = self.save_dir.name
        self.batch_size = int(self.args.batch)
        self.epochs = int(self.args.epochs)
        self.start_epoch = 0
        self.best_fitness = None
        self.fitness = None
        self.metrics = None
        self.best_vars = None
        self.model_facade = None
        self.callbacks = _callbacks or get_default_callbacks()
        np.random.seed(self.args.seed)
        import random

        random.seed(self.args.seed)
        self.data = self.get_dataset()
        add_integration_callbacks(self)

    # -- dataset -------------------------------------------------------------
    def get_dataset(self):
        task = self.args.task
        if task == "classify":
            return check_cls_dataset(self.args.data)
        return check_det_dataset(self.args.data)

    def build_dataset(self, img_path, mode="train", batch=None):
        cfg = self.args
        return build_yolo_dataset(cfg, img_path, batch or self.batch_size, self.data, mode=mode, stride=int(max(self.model.stride)))

    # -- model ---------------------------------------------------------------
    def setup_model(self):
        """Bind/construct the task model + variables."""
        facade = self.model_facade
        if facade is None:
            from drone_yolo_tpu.engine.model import YOLO

            facade = self.model_facade = YOLO(self.args.model, task=self.args.task)
        data_nc = self.data.get("nc")
        data_kpt = self.data.get("kpt_shape")
        kpt_differs = (
            self.args.task == "pose"
            and data_kpt
            and tuple(data_kpt) != tuple(getattr(facade.model.head, "kpt_shape", data_kpt))
        )
        if (data_nc and facade.model.nc != data_nc) or kpt_differs:
            # rebuild head for the dataset's class/keypoint config (reference
            # rebuilds the model with nc from check_det_dataset, trainer.py:545)
            from drone_yolo_tpu.nn.model import PoseModel, TASK2MODELCLASS

            if self.args.task == "pose":
                facade.model = PoseModel(facade.model.yaml, nc=data_nc, data_kpt_shape=tuple(data_kpt or (None, None)))
            else:
                facade.model = TASK2MODELCLASS[facade.task](facade.model.yaml, nc=data_nc)
            facade.variables = None
        self.model = facade.model
        self.model.names = self.data.get("names", self.model.names)
        imgsz = int(self.args.imgsz)
        facade.ensure_variables(imgsz=imgsz, seed=self.args.seed)
        self.variables = facade.variables

    def get_criterion(self):
        from drone_yolo_tpu.nn import modules as M_
        from drone_yolo_tpu.utils.loss import E2EDetectLoss

        if isinstance(self.model.head, M_.v10Detect):
            return E2EDetectLoss(self.model, box=self.args.box, cls=self.args.cls, dfl=self.args.dfl)
        return v8DetectionLoss(self.model, box=self.args.box, cls=self.args.cls, dfl=self.args.dfl)

    def get_validator(self):
        from drone_yolo_tpu.models.yolo import TASK_MAP

        v = TASK_MAP[self.args.task]["validator"](
            args={**vars(self.args), "mode": "val", "conf": 0.001, "plots": False},
            save_dir=self.save_dir,
        )
        return v

    # -- training ------------------------------------------------------------
    def train(self):
        self._setup_train()
        self._do_train()

    def _setup_train(self):
        from drone_yolo_tpu.utils import enable_compile_cache

        enable_compile_cache()
        self.run_callbacks("on_pretrain_routine_start")
        self.setup_model()
        if getattr(self.args, "spd_stem", False):
            applied = self.model.enable_spd_stem()
            LOGGER.info(f"spd_stem: {'enabled (exact space-to-depth stem reformulation)' if applied else 'not applicable to this stem, ignored'}")
        self._padded_state = False
        if getattr(self.args, "lane_pad", False):
            n_pad = self.model.enable_lane_pad()
            if n_pad:
                # padded-state masters: the pads live in the stored arrays, not
                # the step (padded slots are training-invariant exact zeros —
                # nn/model.py pad_variables). Checkpoints/resume stay canonical.
                self.variables = self.model.pad_variables(self.variables, imgsz=int(self.args.imgsz))
                self._padded_state = True
            LOGGER.info(f"lane_pad: {n_pad} narrow convs zero-padded to full MXU lanes (padded-state masters, exact)")
        self.wdir.mkdir(parents=True, exist_ok=True)
        yaml_save(self.save_dir / "args.yaml", vars(self.args))

        # mesh: 1-D data parallel over the selected devices (args.device picks
        # indices like the reference's device="0,1"; default = all visible)
        dev_arg = self.args.device
        if dev_arg not in (None, "", "auto", "tpu", "cpu"):
            idxs = [int(x) for x in str(dev_arg).split(",")]
            devices = [jax.devices()[i] for i in idxs]
        else:
            devices = list(jax.devices())
        n_dev = len(devices)
        if self.batch_size % n_dev != 0:
            old = self.batch_size
            self.batch_size = max(n_dev, self.batch_size // n_dev * n_dev)
            LOGGER.warning(f"batch {old} not divisible by {n_dev} devices; using {self.batch_size}")
        tp = max(int(getattr(self.args, "tp", 1) or 1), 1)
        sp = max(int(getattr(self.args, "sp", 1) or 1), 1)
        assert n_dev % (tp * sp) == 0, f"tp={tp} * sp={sp} must divide device count {n_dev}"
        if sp > 1:
            # spatial partitioning (SURVEY §5.7's sequence-parallel analog):
            # activations shard their H dim over "space"; GSPMD inserts the
            # conv halo exchanges. Composes with DP (and TP via "model").
            # >= 2 rows per shard at the deepest (stride-32) map: XLA GSPMD
            # mis-reduces the chained-conv+residual backward (grad x data-axis)
            # when the stride-32 H collapses to 2 with sp=2 (probed in
            # tests/test_sp.py); 2-row shards verified exact at sp=2 and sp=4
            assert int(self.args.imgsz) % (sp * 64) == 0, (
                f"imgsz={self.args.imgsz} must divide into {sp} stride-32 shards of >= 2 rows "
                f"(imgsz % {sp * 64} == 0)"
            )
            M.set_sp_safe_pool(True)  # SelectAndScatter mispartitions under "space"
            axes = ("data", "space") if tp == 1 else ("data", "space", "model")
            shape = (n_dev // (tp * sp), sp) + ((tp,) if tp > 1 else ())
            self.mesh = make_mesh(shape=shape, axes=axes, devices=devices)
        elif tp > 1:
            # hybrid DP x TP: wide conv kernels shard over "model" (place_state)
            self.mesh = make_mesh(shape=(n_dev // tp, tp), axes=("data", "model"), devices=devices)
        else:
            self.mesh = make_mesh(devices=devices)
        LOGGER.info(f"Training on {n_dev} device(s) (mesh {dict(self.mesh.shape)}), global batch {self.batch_size}")

        # on-device augmentation (data/device_aug.py): detect/segment/pose
        self.device_aug = bool(getattr(self.args, "device_aug", False))
        if self.device_aug and self.args.task not in ("detect", "segment", "pose"):
            LOGGER.warning(f"device_aug not supported for task={self.args.task}; using host augmentation")
            self.device_aug = False
            self.args.device_aug = False
        if self.device_aug and self.args.task == "segment" and (self.args.mixup or 0) > 0:
            # an overlap-ID mask cannot represent instances of two blended images
            LOGGER.warning("device_aug does not support segment+mixup; using host augmentation")
            self.device_aug = False
            self.args.device_aug = False
        if self.device_aug:
            LOGGER.info("device_aug=True: mosaic/affine/HSV/flip run on-device inside the jitted step")

        # data
        train_path, val_path = self.data.get("train"), self.data.get("val")
        self.trainset = self.build_dataset(train_path, "train", self.batch_size)
        self.train_loader = build_dataloader(
            self.trainset, self.batch_size, self.args.workers, shuffle=True, seed=self.args.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        self.nb = len(self.train_loader)
        self.validator = self.get_validator() if self.args.val and val_path else None

        # optimizer
        self.accumulate = max(round(self.args.nbs / self.batch_size), 1)
        weight_decay = self.args.weight_decay * self.batch_size * self.accumulate / self.args.nbs
        iterations = math.ceil(self.nb / self.accumulate) * self.epochs
        self.opt_name, self.lr0, self.momentum = auto_optimizer(self.args, self.data.get("nc", self.model.nc), iterations)
        self.weight_decay = weight_decay
        LOGGER.info(
            f"optimizer: {self.opt_name}(lr={self.lr0}, momentum={self.momentum}) "
            f"wd={weight_decay:.5f}, accumulate={self.accumulate}"
        )
        self.lf = build_lr_fn(self.args, self.epochs)
        self.criterion = self.get_criterion()
        self.stopper = EarlyStopping(patience=self.args.patience)

        # bf16 sanity probe (replaces the reference's check_amp, checks.py:651)
        if self.args.amp:
            from drone_yolo_tpu.utils.checks import check_numeric_stability

            if not check_numeric_stability(self.model, self.variables, imgsz=64):
                LOGGER.warning("bf16 deviation detected; consider amp=False (fp32 activations)")

        # state pytree (replicated over the mesh)
        labels = label_tree(self.variables)
        self.labels = labels
        zeros_like = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)  # noqa: E731
        opt_state = init_adam(self.variables) if self.opt_name.lower().startswith("adam") else init_momentum(self.variables)
        self.state = {
            "params": self.variables,
            "opt": opt_state,
            # true copy: astype is a no-op on fp32 leaves and would alias params,
            # making state donation fail with "donate the same buffer twice"
            "ema": jax.tree_util.tree_map(lambda x: jnp.array(x, dtype=jnp.float32, copy=True), self.variables),
            "acc": zeros_like(self.variables),
            "count": jnp.zeros((), jnp.int32),
            "step": jnp.zeros((), jnp.int32),  # optimizer steps (EMA ramp counter)
        }
        self.zero = bool(getattr(self.args, "zero", False))
        if self.zero:
            LOGGER.info("zero=True: optimizer/EMA/accumulator state sharded over the data axis (ZeRO-style)")
        self.state = place_state(self.state, self.mesh, zero=self.zero)
        self._build_train_step()
        self.resume_training()
        self.run_callbacks("on_pretrain_routine_end")

    def _build_train_step(self):
        model, criterion = self.model, self.criterion
        accumulate = self.accumulate
        dtype = jnp.bfloat16 if self.args.amp else jnp.float32
        use_adam = self.opt_name.lower().startswith("adam")
        weight_decay = self.weight_decay
        merge_bn = self.model.merge_bn_updates
        base_imgsz = int(self.args.imgsz)

        # multi-scale buckets: a small static-size set so each size compiles once
        # (reference resizes 0.5-1.5x per batch, detect/train.py:60 — dynamic
        # shapes would force recompiles on TPU, so we bucket)
        stride = int(max(self.model.stride))
        sp = max(int(getattr(self.args, "sp", 1) or 1), 1)
        self.scale_buckets = compute_scale_buckets(base_imgsz, stride, sp, bool(self.args.multi_scale))

        device_aug = self.device_aug
        if device_aug:
            from drone_yolo_tpu.data.device_aug import aug_hyp_from_args, device_augment

            aug_hyp = aug_hyp_from_args(self.args, flip_idx=getattr(self.trainset, "flip_idx", None))

        def step_fn(state, batch, lr_w, lr_b, mom, target_sz, aug_mosaic=False):
            # fold in BOTH the optimizer step and the micro-step counter: with
            # gradient accumulation (nbs > batch) "step" is constant across a
            # window, and augmentation draws must not repeat across its
            # micro-batches; still resume-exact (count is saved/restored)
            step_rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(self.args.seed), state["step"]), state["count"]
            )
            img = batch["img"]
            if device_aug and img.dtype != jnp.uint8:
                # device_augment blends gray-114 on the 0..255 scale; a float
                # batch (already 0..1) would be silently destroyed
                raise ValueError(f"device_aug=True requires uint8 train batches, got {img.dtype}")
            if img.dtype == jnp.uint8:
                # batches ship as uint8 (4x less H2D traffic than fp32, same
                # win as the validator/predictor); normalize on device
                img = img.astype(jnp.float32)
                if not device_aug:
                    img = img / 255.0
                batch = {**batch, "img": img}
            if device_aug:
                # img in 0..255 here; device_augment normalizes to 0..1
                batch = device_augment(batch, jax.random.fold_in(step_rng, 1), aug_hyp, aug_mosaic)
                img = batch["img"]
            if img.shape[1] != target_sz:
                b = img.shape[0]
                scale = target_sz / img.shape[1]
                img = jax.image.resize(img, (b, target_sz, target_sz, img.shape[3]), method="bilinear")
                batch = {**batch, "img": img}
                if "bboxes" in batch:
                    batch["bboxes"] = batch["bboxes"] * scale
                if "keypoints" in batch:
                    kp = batch["keypoints"]
                    batch["keypoints"] = jnp.concatenate([kp[..., :2] * scale, kp[..., 2:]], axis=-1)

            def loss_fn(params):
                ctx = M.Ctx(train=True, dtype=dtype, targets=batch, rng=step_rng)
                out = model.apply(params, batch["img"], ctx=ctx)
                loss, items = criterion(out, batch)
                return loss, (items, ctx.updates)

            (loss, (items, bn_updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
            acc = jax.tree_util.tree_map(lambda a, g: a + g.astype(a.dtype), state["acc"], grads)
            count = state["count"] + 1

            def do_apply(op):
                params, opt, ema, acc_in = op
                scaled = jax.tree_util.tree_map(lambda g: g / accumulate, acc_in)
                clipped, _ = clip_global_norm(scaled, 10.0)
                if use_adam:
                    new_params, new_opt = adamw_step(params, clipped, opt, self.labels, lr_w, lr_b, mom, weight_decay)
                else:
                    new_params, new_opt = sgd_step(params, clipped, opt, self.labels, lr_w, lr_b, mom, weight_decay)
                new_ema = ema_update(ema, new_params, state["step"] + 1)
                zero = jax.tree_util.tree_map(jnp.zeros_like, acc_in)
                return new_params, new_opt, new_ema, zero

            def no_apply(op):
                params, opt, ema, acc_in = op
                return params, opt, ema, acc_in

            apply_now = count >= accumulate
            params, opt, ema, acc = jax.lax.cond(apply_now, do_apply, no_apply, (state["params"], state["opt"], state["ema"], acc))
            params = merge_bn(params, bn_updates)
            new_state = {
                "params": params,
                "opt": opt,
                "ema": ema,
                "acc": acc,
                "count": jnp.where(apply_now, 0, count),
                "step": state["step"] + apply_now.astype(jnp.int32),
            }
            return new_state, loss, items

        if getattr(self, "zero", False):
            # pin the output state to the input shardings: without this the
            # partitioner may choose to all-gather the sharded moments back to
            # replicated at the step boundary, silently undoing the memory win
            state_sh = jax.tree_util.tree_map(lambda x: x.sharding, self.state)
            self.train_step = jax.jit(
                step_fn, donate_argnums=(0,), static_argnames=("target_sz", "aug_mosaic"),
                out_shardings=(state_sh, None, None),
            )
        else:
            self.train_step = jax.jit(step_fn, donate_argnums=(0,), static_argnames=("target_sz", "aug_mosaic"))

    def preprocess_batch(self, batch):
        """uint8 HWC host batch -> sharded device arrays (normalize in-graph)."""
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        arrays["img"] = np.ascontiguousarray(batch["img"])  # stays uint8: /255 happens on device
        return shard_batch(arrays, self.mesh)

    def _warmup_hyp(self, ni: int, epoch: int):
        """Per-batch lr/momentum warmup interpolation (reference trainer.py:366)."""
        nw = max(round(self.args.warmup_epochs * self.nb), 100) if self.args.warmup_epochs > 0 else -1
        lr = self.lr0 * self.lf(epoch)
        if ni <= nw and nw > 0:
            xi = [0, nw]
            lr_w = float(np.interp(ni, xi, [0.0, lr]))
            lr_b = float(np.interp(ni, xi, [self.args.warmup_bias_lr, lr]))
            mom = float(np.interp(ni, xi, [self.args.warmup_momentum, self.momentum]))
        else:
            lr_w = lr_b = lr
            mom = self.momentum
        return lr_w, lr_b, mom

    def _do_train(self):
        self.run_callbacks("on_train_start")
        LOGGER.info(
            f"Image sizes {self.args.imgsz} train, {self.args.imgsz} val\n"
            f"Logging results to {colorstr('bold', self.save_dir)}\n"
            f"Starting training for {self.epochs} epochs..."
        )
        t0 = time.time()
        ni = self.start_epoch * self.nb
        final_epoch = self.epochs - 1
        for epoch in range(self.start_epoch, self.epochs):
            self.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            if epoch == self.epochs - self.args.close_mosaic and self.args.close_mosaic and hasattr(self.trainset, "close_mosaic"):
                LOGGER.info("Closing dataloader mosaic")
                self.trainset.close_mosaic(self.args)
            # device-aug mosaic gate (static jit arg: one recompile at close)
            aug_mosaic = bool(
                self.device_aug and self.args.mosaic > 0
                and (not self.args.close_mosaic or epoch < self.epochs - self.args.close_mosaic)
            )
            self.train_loader.set_epoch(epoch)

            tloss = None
            n_done = 0
            pending_items = None  # one-step-delayed fetch: shipping batch i+1 overlaps step i on device
            pbar = TQDM(enumerate(self.train_loader), total=self.nb, desc=f"{epoch + 1}/{self.epochs}")
            for i, batch in pbar:
                self.run_callbacks("on_train_batch_start")
                lr_w, lr_b, mom = self._warmup_hyp(ni, epoch)
                dev_batch = self.preprocess_batch(batch)
                target_sz = self.scale_buckets[np.random.randint(len(self.scale_buckets))] if len(self.scale_buckets) > 1 else self.scale_buckets[0]
                if pending_items is not None:
                    items = np.asarray(pending_items)  # blocks on step i-1 only
                    tloss = items if tloss is None else (tloss * n_done + items) / (n_done + 1)
                    n_done += 1
                self.state, loss, pending_items = self.train_step(
                    self.state, dev_batch, jnp.float32(lr_w), jnp.float32(lr_b), jnp.float32(mom),
                    target_sz=target_sz, aug_mosaic=aug_mosaic,
                )
                if self.args.plots and ni < 3 and "bboxes" in batch:
                    from drone_yolo_tpu.utils.plotting import plot_images

                    valid = batch["mask"].reshape(-1).astype(bool)
                    bi = np.repeat(np.arange(batch["cls"].shape[0]), batch["cls"].shape[1])
                    plot_images(
                        batch["img"].astype(np.float32) / 255.0,
                        bi[valid],
                        batch["cls"].reshape(-1)[valid],
                        batch["bboxes"].reshape(-1, 4)[valid],
                        fname=self.save_dir / f"train_batch{ni}.jpg",
                        names=self.model.names,
                    )
                ni += 1
                self.lr_current = lr_w
                if tloss is not None and hasattr(pbar, "set_description"):
                    pbar.set_description(
                        f"{epoch + 1}/{self.epochs} " + " ".join(f"{n}={v:.3f}" for n, v in zip(self.loss_names, tloss))
                    )
                self.run_callbacks("on_train_batch_end")

            if pending_items is not None:  # flush the last step's metrics
                items = np.asarray(pending_items)
                tloss = items if tloss is None else (tloss * n_done + items) / (n_done + 1)

            self.label_loss_items_dict = {f"train/{n}": float(v) for n, v in zip(self.loss_names, tloss if tloss is not None else np.zeros(len(self.loss_names)))}
            self.label_loss_items_dict["lr"] = self.lr_current if self.nb else 0.0
            self.run_callbacks("on_train_epoch_end")

            # validation + checkpointing (single-controller: process 0 writes)
            self.metrics = {}
            if self.validator is not None and (self.args.val or epoch == final_epoch):
                self.metrics = self.validate()
                self.fitness = self.metrics.get("fitness", 0.0)
                if self.best_fitness is None or self.fitness > self.best_fitness:
                    self.best_fitness = self.fitness
                    self.best_vars = self._unpad_tree(jax.device_get(self.state["ema"]))
            self.run_callbacks("on_fit_epoch_end")
            if self.args.save and jax.process_index() == 0:
                self.save_model()
                self.run_callbacks("on_model_save")
            if self.stopper(epoch, self.fitness):
                LOGGER.info(f"EarlyStopping: no improvement for {self.args.patience} epochs, stopping at epoch {epoch}")
                break

        LOGGER.info(f"\n{self.epochs - self.start_epoch} epochs completed in {(time.time() - t0) / 3600:.3f} hours.")
        # host copy of the final EMA weights: the facade must never be left
        # holding buffers that the donated train step has consumed
        self.final_vars = self._unpad_tree(jax.device_get(self.state["ema"]))
        if self.best_vars is None:
            self.best_vars = self.final_vars
        if self.args.plots and jax.process_index() == 0:
            from drone_yolo_tpu.utils.plotting import plot_results

            plot_results(file=str(self.save_dir / "results.csv"))
        self.run_callbacks("on_train_end")

    def validate(self):
        """Run the validator on EMA weights (reference trainer.py:427,671)."""
        ema_vars = self.state["ema"]
        metrics = self.validator(model=self.model_facade, variables=ema_vars)
        return metrics if isinstance(metrics, dict) else getattr(self.validator.metrics, "results_dict", {})

    def _unpad_tree(self, tree):
        """Padded-state masters -> canonical (identity when lane_pad is off)."""
        return self.model.unpad_variables(tree) if self._padded_state else tree

    def _unpad_opt(self, opt):
        if not self._padded_state:
            return opt
        if isinstance(opt, dict) and "m" in opt and "v" in opt:  # adam: moments + timestep
            return {**opt, "m": self.model.unpad_variables(opt["m"]), "v": self.model.unpad_variables(opt["v"])}
        return self.model.unpad_variables(opt)

    def _pad_tree(self, tree):
        return self.model.pad_variables(tree, imgsz=int(self.args.imgsz)) if self._padded_state else tree

    def _pad_opt(self, opt):
        if not self._padded_state:
            return opt
        if isinstance(opt, dict) and "m" in opt and "v" in opt:
            return {**opt, "m": self._pad_tree(opt["m"]), "v": self._pad_tree(opt["v"])}
        return self._pad_tree(opt)

    def save_model(self):
        """last/best checkpoints with EMA weights (reference trainer.py:514)."""
        ema_host = self._unpad_tree(jax.device_get(self.state["ema"]))
        meta = {
            "epoch": self.epoch,
            "best_fitness": float(self.best_fitness) if self.best_fitness is not None else 0.0,
        }
        save_checkpoint(self.wdir / "last.npz", self.model, ema_host, train_args=vars(self.args), meta=meta)
        if self.best_fitness is not None and self.best_fitness == self.fitness:
            save_checkpoint(self.wdir / "best.npz", self.model, ema_host, train_args=vars(self.args), meta=meta)
        if self.args.save_period > 0 and self.epoch % self.args.save_period == 0:
            save_checkpoint(self.wdir / f"epoch{self.epoch}.npz", self.model, ema_host, train_args=vars(self.args), meta=meta)
        # full resume state (params + optimizer + counters)
        from drone_yolo_tpu.engine.checkpoint import flatten_tree

        resume_state = {
            "params": self._unpad_tree(jax.device_get(self.state["params"])),
            "opt": self._unpad_opt(jax.device_get(self.state["opt"])),
            "ema": ema_host,
            "step": np.asarray(self.state["step"]),
            "count": np.asarray(self.state["count"]),
            "epoch": np.int32(self.epoch),
        }
        np.savez(self.wdir / "resume_state.npz", **flatten_tree(resume_state))

    def resume_training(self):
        """Restore full train state if resume requested (reference trainer.py:729)."""
        if not self.args.resume:
            return
        from drone_yolo_tpu.engine.checkpoint import unflatten_tree

        path = Path(self.args.resume) if isinstance(self.args.resume, str) else self.wdir / "resume_state.npz"
        if not path.exists():
            LOGGER.warning(f"resume state {path} not found; starting fresh")
            return
        data = np.load(path, allow_pickle=False)
        tree = unflatten_tree({k: data[k] for k in data.files})
        params = self._pad_tree(tree["params"])
        self.state = place_state(
            {
                "params": params,
                "opt": self._pad_opt(tree["opt"]),
                "ema": self._pad_tree(tree["ema"]),
                "acc": jax.tree_util.tree_map(lambda x: np.zeros_like(x), params),
                # count restored (when present) so the per-micro-step RNG
                # stream continues exactly across resume under accumulation
                "count": jnp.asarray(tree["count"]) if "count" in tree else jnp.zeros((), jnp.int32),
                "step": jnp.asarray(tree["step"]),
            },
            self.mesh,
            zero=getattr(self, "zero", False),
        )
        self.start_epoch = int(tree["epoch"]) + 1
        LOGGER.info(f"Resuming training from epoch {self.start_epoch}")
