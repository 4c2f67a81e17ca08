"""Streaming predictor: source setup, letterbox, fused forward+NMS, Results.

Capability parity with `ultralytics/engine/predictor.py:66-410` (BasePredictor:
stream_inference generator, setup_source, preprocess, write_results) — with the
TPU twist that forward + DFL decode + NMS compile into ONE XLA program per input
shape, and only fixed-size (max_det, 6) buffers plus a count cross the
device->host boundary per batch (the reference syncs full 8400-anchor tensors to
run torchvision NMS).
"""

from __future__ import annotations

import platform
import threading
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from drone_yolo_tpu.cfg import get_cfg, get_save_dir
from drone_yolo_tpu.data.loaders import (
    LoadImagesAndVideos,
    LoadPilAndNumpy,
    LoadScreenshots,
    LoadStreams,
    LoadTensor,
    SourceTypes,
)
from drone_yolo_tpu.engine.results import Results
from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.ops.letterbox import letterbox_np
from drone_yolo_tpu.ops.nms import class_mask, non_max_suppression
from drone_yolo_tpu.ops.boxes import scale_boxes
from drone_yolo_tpu.utils import DEFAULT_CFG_DICT, LOGGER, colorstr
from drone_yolo_tpu.utils.callbacks import CallbackMixin, get_default_callbacks

STREAM_WARNING = "inference results will accumulate in RAM; use stream=True for long sources"


class Profile:
    """Context timer (reference utils/ops.py:17). Blocks on device results."""

    def __init__(self):
        self.t = 0.0
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt


class BasePredictor(CallbackMixin):
    """Streaming generator inference engine."""

    @staticmethod
    def adapt_raw(preds):
        """Hook: adapt raw model output to the uniform (B, A, 4+nc) contract
        before NMS (overridden by NASPredictor — reference models/nas/predict.py)."""
        return preds

    def __init__(self, cfg=DEFAULT_CFG_DICT, overrides=None, _callbacks=None):
        self.args = get_cfg(cfg, overrides)
        if self.args.conf is None:
            self.args.conf = 0.25
        self.save_dir = get_save_dir(self.args)
        self.done_warmup = False
        self.facade = None
        self.model = None
        self.backend = None
        self.variables = None
        self.imgsz = None
        self.source_type = None
        self.dataset = None
        self.vid_writers = {}
        self.results = None
        self.callbacks = _callbacks or get_default_callbacks()
        self._lock = threading.Lock()  # thread-safe concurrent predict (reference predictor.py:115)
        self._jit_cache = {}

    # -- model --------------------------------------------------------------
    def setup_model(self, facade, verbose: bool = False):
        """Bind a YOLO facade; fuse weights for inference. Facades wrapping an
        exported artifact (YOLO('best.onnx')) run through AutoBackend instead
        of the jitted model — the reference predictor's primary path."""
        self.facade = facade
        self.backend = getattr(facade, "backend", None)
        if self.backend is not None:
            self.model = None
            self.variables = None
            self.names = self.backend.names
            self.nc = self.backend.nc
            return
        self.model = facade.model
        imgsz = self.args.imgsz if isinstance(self.args.imgsz, int) else max(self.args.imgsz)
        facade.ensure_variables(imgsz=imgsz)
        self.variables = self.model.fuse(facade.variables)
        self.names = self.model.names
        self.nc = self.model.nc
        from drone_yolo_tpu.utils.checks import resolve_dtype

        self.dtype = jnp.bfloat16 if self.args.dtype == "bfloat16" else resolve_dtype(self.args.half)

    def _forward_fn(self, shape):
        """Fused forward+decode+NMS program for one static input shape."""
        key = shape
        if key in self._jit_cache:
            return self._jit_cache[key]
        conf = float(self.args.conf)
        iou = float(self.args.iou)
        max_det = int(self.args.max_det)
        agnostic = bool(self.args.agnostic_nms)
        nc = self.nc
        cmask = class_mask(self.args.classes, nc) if self.args.classes is not None else None
        pre_topk = min(int(self.args.pre_nms_topk), 1024)

        if self.backend is not None:
            backend = self.backend
            nms = jax.jit(
                lambda preds: non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk,
                    nc=nc, multi_label=False, agnostic=agnostic, classes=cmask,
                )
            )

            def backend_fn(_variables, x):
                out = backend(np.asarray(x, np.float32))
                if isinstance(out, (list, tuple)):  # multi-output artifacts: element 0 is detection
                    out = out[0]
                return nms(jnp.asarray(self.adapt_raw(out)))

            self._jit_cache[key] = backend_fn
            return backend_fn

        end2end = isinstance(getattr(self.model, "head", None), M.v10Detect)
        augment = bool(self.args.augment) and hasattr(self.model, "predict_augmented") and not end2end

        @jax.jit
        def fn(variables, x):
            if augment:
                preds = self.model.predict_augmented(variables, x, ctx=M.Ctx(train=False, dtype=self.dtype))
            else:
                preds, _ = self.model.apply(variables, x, ctx=M.Ctx(train=False, dtype=self.dtype))
            preds = self.adapt_raw(preds)
            if end2end:  # NMS-free: preds are already (B, max_det, 6) sorted by score
                dets = preds[:, :max_det]
                n_valid = jnp.sum(dets[..., 4] > conf, axis=-1).astype(jnp.int32)
                dets = dets * (dets[..., 4:5] > conf).astype(dets.dtype)
                return dets, n_valid
            return non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=pre_topk,
                nc=nc, multi_label=False, agnostic=agnostic, classes=cmask,
            )

        self._jit_cache[key] = fn
        return fn

    # -- source -------------------------------------------------------------
    def setup_source(self, source):
        imgsz = self.args.imgsz if isinstance(self.args.imgsz, (list, tuple)) else (self.args.imgsz, self.args.imgsz)
        self.imgsz = tuple(int(s) for s in imgsz)
        self.dataset = load_inference_source(
            source, batch=self.args.batch, vid_stride=self.args.vid_stride, buffer=self.args.stream_buffer
        )
        self.source_type = self.dataset.source_type

    # -- pipeline -----------------------------------------------------------
    def preprocess(self, imgs):
        """Letterbox + BGR->RGB + [0,1] NHWC float batch.

        When every frame in the batch shares one shape (the video/stream case),
        the whole preprocess moves on-device: the host ships raw uint8 and a
        jitted resize+pad+normalize runs fused ahead of the model — this keeps
        the single-core host out of the hot loop (reference pins preprocess on
        CPU workers, predictor.py:118-136)."""
        shapes = {im.shape for im in imgs}
        if len(shapes) == 1 and len(imgs) > 0 and not self.args.visualize:
            h, w = imgs[0].shape[:2]
            from drone_yolo_tpu.ops.letterbox import letterbox_params

            r, (dw, dh), _ = letterbox_params((h, w), self.imgsz)
            self.batch_ratio_pad = [(r, (dw, dh))] * len(imgs)
            raw = np.stack([im[:, :, ::-1] for im in imgs])  # BGR -> RGB, uint8
            key = ("lb", raw.shape, tuple(self.imgsz))
            if key not in self._jit_cache:
                from drone_yolo_tpu.ops.letterbox import letterbox_device

                imgsz = tuple(self.imgsz)

                @jax.jit
                def lb(raw):
                    x = raw.astype(jnp.float32) / 255.0
                    return letterbox_device(x, imgsz)[0]

                self._jit_cache[key] = lb
            return self._jit_cache[key](jnp.asarray(raw))
        processed = []
        self.batch_ratio_pad = []
        for im in imgs:
            lb, r, pad = letterbox_np(im, self.imgsz)
            processed.append(lb[:, :, ::-1])  # BGR -> RGB
            self.batch_ratio_pad.append((r, pad))
        # ship uint8, normalize on device: 4x less host->device traffic
        x = np.ascontiguousarray(np.stack(processed))
        key = ("u8n", x.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(lambda raw: raw.astype(jnp.float32) / 255.0)
        return self._jit_cache[key](jnp.asarray(x))

    def postprocess(self, dets, n_valid, x_shape, orig_imgs, paths):
        """Device dets -> host Results with boxes rescaled to original frames."""
        results = []
        dets = np.asarray(dets)
        n_valid = np.asarray(n_valid)
        for i, (im0, path) in enumerate(zip(orig_imgs, paths)):
            d = dets[i, : int(n_valid[i])].copy()
            if len(d):
                d[:, :4] = np.asarray(scale_boxes(x_shape, d[:, :4], im0.shape[:2]))
            results.append(Results(im0, path, self.names, boxes=d))
        return results

    def __call__(self, source=None, stream: bool = False):
        if stream:
            return self.stream_inference(source)
        return list(self.stream_inference(source))

    def stream_inference(self, source):
        """Generator over batches of Results (reference predictor.py:222)."""
        if self.args.verbose:
            LOGGER.info("")
        with self._lock:
            self.setup_source(source if source is not None else self.args.source)
            if self.args.save or self.args.save_txt:
                self.save_dir.mkdir(parents=True, exist_ok=True)
            self.run_callbacks("on_predict_start")
            profilers = (Profile(), Profile(), Profile())
            self.seen, self.windows = 0, []
            for batch in self.dataset:
                self.run_callbacks("on_predict_batch_start")
                paths, im0s, infos = batch
                with profilers[0]:
                    x = self.preprocess(im0s)
                with profilers[1]:
                    fn = self._forward_fn(x.shape)
                    payload, n_valid = fn(self.variables, x)
                    n_valid = jax.device_get(n_valid)
                with profilers[2]:
                    self.results = self.postprocess(payload, n_valid, x.shape[1:3], im0s, paths)
                if self.args.visualize:
                    self._visualize_features(x, paths)
                self.run_callbacks("on_predict_postprocess_end")

                for i, result in enumerate(self.results):
                    self.seen += 1
                    result.speed = {
                        "preprocess": profilers[0].dt * 1e3 / len(im0s),
                        "inference": profilers[1].dt * 1e3 / len(im0s),
                        "postprocess": profilers[2].dt * 1e3 / len(im0s),
                    }
                    if self.args.verbose or self.args.save or self.args.save_txt or self.args.show:
                        self.write_results(i, Path(paths[i]), result, infos)
                self.run_callbacks("on_predict_batch_end")
                yield from self.results

        for w in self.vid_writers.values():
            w.release()
        self.vid_writers = {}
        if self.args.verbose and self.seen:
            t = tuple(p.t / self.seen * 1e3 for p in profilers)
            LOGGER.info(
                f"Speed: {t[0]:.1f}ms preprocess, {t[1]:.1f}ms inference, {t[2]:.1f}ms postprocess per image"
            )
        self.run_callbacks("on_predict_end")

    def _visualize_features(self, x, paths, layers=None):
        """Dump feature-map grids per layer (reference predict visualize=True,
        tasks.py:155 + plotting.py:1373). Diagnostic path: runs layer-by-layer."""
        from drone_yolo_tpu.utils.plotting import feature_visualization

        model = self.model
        layers = layers or [s.i for s in model.layers if s.type in ("C2f", "SPPF", "C3k2", "C2PSA")]
        save_dir = self.save_dir / "features" / Path(paths[0]).stem
        ctx = M.Ctx(train=False, dtype=jnp.float32)
        y, out = [], jnp.asarray(x)
        for spec in model.layers:
            f = spec.f
            xin = out if f == -1 else (y[f] if isinstance(f, int) else [out if j == -1 else y[j] for j in f])
            out = spec.module(self.variables.get(str(spec.i), {}), xin, ctx)
            y.append(out if spec.i in model.save else None)
            if spec.i in layers and not isinstance(out, (list, tuple, dict)):
                feature_visualization(np.asarray(out, np.float32), spec.type, spec.i, save_dir=save_dir)

    def write_results(self, i, path, result, infos):
        """Log/save one result (reference predictor.py:325)."""
        import cv2

        string = infos[i] if i < len(infos) else ""
        if self.args.verbose:
            LOGGER.info(f"{string}{result.verbose()}{result.speed['inference']:.1f}ms")
        frame = getattr(self.dataset, "frame", 0)
        save_path = self.save_dir / path.name
        if self.args.save_txt:
            result.save_txt(self.save_dir / "labels" / f"{path.stem}{'' if self.dataset.mode == 'image' else f'_{frame}'}.txt", save_conf=self.args.save_conf)
        if self.args.save_crop:
            result.save_crop(self.save_dir / "crops", path.stem)
        if self.args.save or self.args.show:
            plotted = result.plot(conf=self.args.show_conf, labels=self.args.show_labels, line_width=self.args.line_width)
            if self.args.save:
                if self.dataset.mode == "image":
                    cv2.imwrite(str(save_path), plotted)
                else:
                    if i not in self.vid_writers:
                        fps = getattr(self.dataset, "fps", [30])
                        fps_i = fps[i] if isinstance(fps, list) and i < len(fps) else 30
                        h, w = plotted.shape[:2]
                        self.vid_writers[i] = cv2.VideoWriter(
                            str(save_path.with_suffix(".mp4")), cv2.VideoWriter_fourcc(*"mp4v"), fps_i, (w, h)
                        )
                    self.vid_writers[i].write(plotted)


def load_inference_source(source, batch: int = 1, vid_stride: int = 1, buffer: bool = False):
    """Pick a loader for the given source (reference data/build.py:186)."""
    source_type = SourceTypes()
    if isinstance(source, (str, Path, int)):
        s = str(source)
        is_url = s.lower().startswith(("https://", "http://", "rtsp://", "rtmp://", "tcp://"))
        if s.isnumeric() or (is_url and not any(s.lower().endswith(f".{f}") for f in IMG_VID_SUFFIXES)) or s.lower().startswith("rtsp://"):
            source_type.stream = True
            ds = LoadStreams(s, vid_stride=vid_stride, buffer=buffer)
        elif s.lower().startswith("screen"):
            source_type.screenshot = True
            ds = LoadScreenshots(s)
        else:
            ds = LoadImagesAndVideos(s, batch=batch, vid_stride=vid_stride)
    elif isinstance(source, (list, tuple)) and source and isinstance(source[0], (str, Path)):
        ds = LoadImagesAndVideos(list(source), batch=batch, vid_stride=vid_stride)
    elif isinstance(source, np.ndarray) and source.ndim == 4 and source.dtype != np.uint8:
        source_type.tensor = True
        ds = LoadTensor(source)
    else:
        source_type.from_img = True
        ds = LoadPilAndNumpy(source)
    ds.source_type = source_type
    return ds


IMG_VID_SUFFIXES = {"bmp", "jpg", "jpeg", "png", "tif", "tiff", "webp", "mp4", "avi", "mov", "mkv", "gif", "webm"}
