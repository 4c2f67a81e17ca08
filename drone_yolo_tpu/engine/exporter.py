"""Exporter: serialize the jitted inference function for deployment.

Capability parity with `ultralytics/engine/exporter.py:207-1527` re-imagined for
the XLA stack: the reference exports to 14 vendor runtimes because torch eager
graphs need a compiler; here the model IS a compiled XLA program, so the native
artifacts are:

* **stablehlo** — `jax.export` portable bytecode (the XLA-world ONNX): loadable
  by any StableHLO consumer (TF, IREE, XLA AOT) and re-importable by us.
* **npz** — the weights+config checkpoint (our .pt analog, always produced).
* **savedmodel / tflite** — via jax2tf when tensorflow is importable (gated).
* **onnx** — emitted natively as protobuf from the fused graph (export/onnx_export.py).

Each export embeds preprocessing (scale) and optionally NMS (`nms=True`) so the
artifact is end-to-end like the reference's `Detect.export` paths.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from drone_yolo_tpu.cfg import get_cfg
from drone_yolo_tpu.utils import LOGGER, colorstr
from drone_yolo_tpu.utils.callbacks import CallbackMixin, get_default_callbacks

EXPORT_FORMATS = {
    "npz": {"suffix": ".npz"},
    "stablehlo": {"suffix": ".stablehlo"},
    "savedmodel": {"suffix": "_saved_model"},
    "tflite": {"suffix": ".tflite"},
    "onnx": {"suffix": ".onnx"},
}


def export_formats():
    """Table of supported formats (reference exporter.py:111)."""
    return EXPORT_FORMATS


class Exporter(CallbackMixin):
    def __init__(self, cfg=None, overrides=None, _callbacks=None):
        self.args = get_cfg(cfg or {}, overrides)
        self.callbacks = _callbacks or get_default_callbacks()

    def _calibration_batches(self, batch: int, imgsz: int, n: int = 8):
        """Representative float batches for int8 PTQ calibration (reference
        exporter.py:924-960 calibration-dataloader semantics). Real images
        from args.data when resolvable, else deterministic random frames."""
        import numpy as np

        files = []
        data = getattr(self.args, "data", None)
        if data:
            try:
                from drone_yolo_tpu.data.loaders import IMG_FORMATS
                from drone_yolo_tpu.data.utils import check_det_dataset

                info = check_det_dataset(data)
                split = info.get("val") or info.get("train")
                if split:
                    files = [f for f in Path(split).rglob("*.*") if f.suffix[1:].lower() in IMG_FORMATS]
            except Exception as e:  # noqa: BLE001 - calibration falls back to random
                LOGGER.warning(f"int8 calibration: could not load '{data}' ({e}); using random frames")
        if files:
            import cv2

            from drone_yolo_tpu.data.utils import imread_rgb
            from drone_yolo_tpu.ops.letterbox import letterbox_np

            for i in range(0, min(len(files), n * batch), batch):
                chunk = files[i : i + batch]
                if len(chunk) < batch:
                    break
                imgs = []
                for f in chunk:
                    im = imread_rgb(f)
                    imgs.append(letterbox_np(im, (imgsz, imgsz))[0].astype(np.float32) / 255.0)
                yield [np.stack(imgs)]
            return
        rng = np.random.default_rng(0)
        for _ in range(n):
            yield [rng.random((batch, imgsz, imgsz, 3), np.float32)]

    def __call__(self, facade):
        self.run_callbacks("on_export_start")
        t0 = time.time()
        fmt = str(self.args.format or "stablehlo").lower()
        if fmt in {"torchscript"}:  # reference default; map to our native artifact
            fmt = "stablehlo"
        assert fmt in EXPORT_FORMATS, f"unknown format '{fmt}', choose from {list(EXPORT_FORMATS)}"

        import jax
        import jax.numpy as jnp

        from drone_yolo_tpu.nn import modules as M
        from drone_yolo_tpu.ops.nms import non_max_suppression

        model = facade.model
        imgsz = self.args.imgsz if isinstance(self.args.imgsz, int) else max(self.args.imgsz)
        facade.ensure_variables(imgsz=imgsz)
        variables = model.fuse(facade.variables)
        batch = int(self.args.batch)
        with_nms = bool(self.args.nms)
        conf = float(self.args.conf or 0.25)
        iou = float(self.args.iou)
        max_det = int(self.args.max_det)
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        def infer(variables, x):
            out = model.apply(variables, x, ctx=M.Ctx(train=False, dtype=dtype))
            preds = out[0] if isinstance(out, tuple) else out
            if with_nms:
                return non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, pre_topk=1024)
            return preds

        x_spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
        stem = Path(str(facade.model_name)).stem or "model"
        out_base = Path(self.args.project or ".") / f"{stem}_{imgsz}"
        out_base.parent.mkdir(parents=True, exist_ok=True)

        # always produce the npz weights artifact
        from drone_yolo_tpu.engine.checkpoint import save_checkpoint

        npz_path = save_checkpoint(out_base.with_suffix(".npz"), model, variables, train_args=facade.overrides)
        produced = [str(npz_path)]

        if fmt == "stablehlo":
            from jax import export as jax_export

            exported = jax_export.export(jax.jit(infer))(
                jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables), x_spec
            )
            blob = exported.serialize()
            path = out_base.with_suffix(".stablehlo")
            path.write_bytes(blob)
            meta = {
                "input": [batch, imgsz, imgsz, 3],
                "nms": with_nms,
                "names": {int(k): v for k, v in model.names.items()},
                "task": model.task,
            }
            path.with_suffix(".stablehlo.json").write_text(json.dumps(meta, indent=2))
            produced.append(str(path))
        elif fmt == "onnx":
            # direct protobuf emission (reference exporter.py:524 uses
            # torch.onnx.export; here the fused graph is emitted natively —
            # export/onnx_export.py) of the raw decoded head (B, 4+nc, A);
            # NMS stays outside like the reference's default onnx artifact
            from drone_yolo_tpu.export.onnx_export import export_onnx

            path = export_onnx(model, facade.variables, out_base.with_suffix(".onnx"), imgsz=imgsz, batch=batch)
            meta = {
                "input": [batch, 3, imgsz, imgsz],
                "names": {int(k): v for k, v in model.names.items()},
                "task": model.task,
                "stride": int(max(model.stride)) if getattr(model, "stride", None) is not None else 32,
            }
            Path(str(path) + ".json").write_text(json.dumps(meta, indent=2))
            produced.append(str(path))
        elif fmt in {"savedmodel", "tflite"}:
            try:
                import tensorflow as tf  # noqa: F401
                from jax.experimental import jax2tf
            except ImportError as e:
                raise ImportError(f"format '{fmt}' requires tensorflow (jax2tf): {e}") from e
            tf_fn = jax2tf.convert(lambda x: infer(variables, x), with_gradient=False)
            module = tf.Module()
            module.f = tf.function(
                lambda images: tf_fn(images),
                input_signature=[tf.TensorSpec([batch, imgsz, imgsz, 3], tf.float32, name="images")],
            )
            sm_path = str(out_base) + "_saved_model"
            # register a serving signature so non-Python runtimes (TF C/C++ API,
            # examples/cpp_savedmodel_inference) can drive the artifact
            tf.saved_model.save(
                module, sm_path, signatures={"serving_default": module.f.get_concrete_function()}
            )
            produced.append(sm_path)
            if fmt == "tflite":
                converter = tf.lite.TFLiteConverter.from_saved_model(sm_path)
                if getattr(self.args, "int8", False):
                    # post-training int8 quantization with a representative
                    # calibration set (reference exporter.py:483,924-960). The
                    # calibration images come from args.data when provided,
                    # otherwise deterministic random frames (shape-only calib).
                    converter.optimizations = [tf.lite.Optimize.DEFAULT]
                    converter.representative_dataset = lambda: self._calibration_batches(batch, imgsz)
                    converter.target_spec.supported_ops = [
                        tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
                        tf.lite.OpsSet.TFLITE_BUILTINS,
                    ]
                tfl = converter.convert()
                suffix = "_int8.tflite" if getattr(self.args, "int8", False) else ".tflite"
                p = Path(str(out_base) + suffix)
                p.write_bytes(tfl)
                produced.append(str(p))
        LOGGER.info(f"{colorstr('green', 'export success')} ({time.time() - t0:.1f}s): {produced}")
        self.run_callbacks("on_export_end")
        return produced[-1]


def load_stablehlo(path):
    """Re-import an exported .stablehlo artifact as a callable (AutoBackend analog)."""
    from jax import export as jax_export

    blob = Path(path).read_bytes()
    exported = jax_export.deserialize(blob)
    meta_path = Path(str(path) + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return exported.call, meta
