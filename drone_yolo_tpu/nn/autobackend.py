"""AutoBackend: one forward interface over every export artifact.

Capability parity with `ultralytics/nn/autobackend.py:54-535` (AutoBackend),
scoped to the XLA-world artifact set: npz (native weights + jit), stablehlo
(jax.export bytecode), TF SavedModel, and TFLite. Every backend exposes
`__call__(x)` taking a float32 NHWC batch in [0, 1] and returning raw
predictions (B, A, 4+nc[+extra]); NMS stays in the caller (validator/predictor)
exactly like the reference.

The stablehlo artifact's weights ride in the sibling .npz the exporter always
writes; metadata (names/task/input shape) comes from the .json sidecar or the
npz header.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER


class AutoBackend:
    """Uniform forward() over exported artifacts: npz/stablehlo/savedmodel/tflite/onnx + serving URLs (reference autobackend.py:54)."""
    def __init__(self, weights, half: bool = False):
        self.path = Path(str(weights))
        self.half = half
        p = str(weights)
        self.meta: dict = {}
        if p.startswith(("http://", "https://", "grpc://", "grpcs://", "triton://")):
            self.kind = "triton"
            self._init_triton(p)
        elif p.endswith(".npz"):
            self.kind = "npz"
            self._init_npz()
        elif p.endswith(".stablehlo"):
            self.kind = "stablehlo"
            self._init_stablehlo()
        elif p.endswith(".onnx"):
            self.kind = "onnx"
            self._init_onnx()
        elif p.endswith(".tflite"):
            self.kind = "tflite"
            self._init_tflite()
        elif self.path.is_dir() and (self.path / "saved_model.pb").exists():
            self.kind = "savedmodel"
            self._init_savedmodel()
        else:
            raise ValueError(f"unrecognized artifact: {weights}")
        LOGGER.info(f"AutoBackend: {self.kind} <- {self.path}")

    # -- per-format loaders ------------------------------------------------------
    def _init_triton(self, url: str):
        """Remote serving endpoint (reference nn/autobackend.py:130-137 'nvidia_triton')."""
        from drone_yolo_tpu.utils.triton import TritonRemoteModel

        remote = TritonRemoteModel(url.replace("triton://", "http://"))
        self.model = None
        self.path = url
        if remote.metadata:
            self.meta.update(remote.metadata)

        def call(x):
            out = remote(np.asarray(x))
            return out[0] if len(out) == 1 else out

        self._call = call
    def _sibling_meta(self):
        """names/task/stride from whichever sidecar exists."""
        js = Path(str(self.path) + ".json")
        if js.exists():
            self.meta.update(json.loads(js.read_text()))
        npz = self.path.with_suffix(".npz")
        if npz.exists():
            data = np.load(npz, allow_pickle=False)
            if "__header__" in data.files:
                hdr = json.loads(bytes(data["__header__"]).decode())
                self.meta.setdefault("names", hdr.get("names"))
                self.meta.setdefault("task", hdr.get("task"))
                self.meta.setdefault("stride", hdr.get("stride"))

    def _init_npz(self):
        import jax
        import jax.numpy as jnp

        from drone_yolo_tpu.engine.checkpoint import load_checkpoint
        from drone_yolo_tpu.nn import modules as M

        model, variables, ckpt = load_checkpoint(self.path)
        self.model = model
        variables = model.fuse(variables)
        dtype = jnp.bfloat16 if self.half else jnp.float32

        @jax.jit
        def fn(v, x):
            out = model.apply(v, x, ctx=M.Ctx(train=False, dtype=dtype))
            return out[0] if isinstance(out, tuple) else out

        self._call = lambda x: fn(variables, x)
        self.meta = {
            "names": model.names,
            "task": model.task,
            "stride": [float(s) for s in model.stride],
            "nc": model.nc,
        }

    def _init_stablehlo(self):
        import jax.numpy as jnp

        from drone_yolo_tpu.engine.checkpoint import load_checkpoint
        from drone_yolo_tpu.engine.exporter import load_stablehlo

        loaded, meta = load_stablehlo(self.path)
        self.meta = dict(meta)
        npz = self.path.with_suffix(".npz")
        assert npz.exists(), f"stablehlo artifact needs its sibling weights {npz}"
        model, variables, _ = load_checkpoint(npz)
        self.model = model
        # the exporter traced with model.fuse(vars), whose tree includes EMPTY
        # dicts for paramless layers (Concat/Upsample); the npz round-trip drops
        # leafless nodes, so re-fuse to regenerate the exact exported structure
        variables = model.fuse(variables)
        self._call = lambda x: loaded(variables, jnp.asarray(x))
        self.meta.setdefault("names", model.names)
        self.meta.setdefault("task", model.task)
        self.meta.setdefault("stride", [float(s) for s in model.stride])

    def _init_savedmodel(self):
        import tensorflow as tf

        module = tf.saved_model.load(str(self.path))
        fn = module.f if hasattr(module, "f") else module.signatures["serving_default"]
        self._call = lambda x: np.asarray(fn(np.asarray(x, np.float32)))
        self.model = None
        # sidecar next to "<stem>_saved_model"
        self.path = Path(str(self.path))
        base = Path(str(self.path).replace("_saved_model", ""))
        js = base.with_suffix(".stablehlo.json")
        if js.exists():
            self.meta.update(json.loads(js.read_text()))
        npz = base.with_suffix(".npz")
        if npz.exists():
            hdrdata = np.load(npz, allow_pickle=False)
            hdr = json.loads(bytes(hdrdata["__header__"]).decode())
            self.meta.setdefault("names", hdr.get("names"))
            self.meta.setdefault("task", hdr.get("task"))
            self.meta.setdefault("stride", hdr.get("stride"))

    def _init_onnx(self):
        """ONNX via OpenCV DNN (the reference's cv2.dnn path, autobackend
        'opencv-dnn'; onnxruntime is not shipped in this image). The artifact
        is NCHW in, (B, 4+nc, A) raw decoded preds out — transposed here to
        the uniform NHWC-in / (B, A, 4+nc)-out contract."""
        import cv2

        net = cv2.dnn.readNetFromONNX(str(self.path))
        self.model = None
        self._sibling_meta()
        out_names = list(net.getUnconnectedOutLayersNames())

        def call(x):
            net.setInput(np.ascontiguousarray(np.asarray(x, np.float32).transpose(0, 3, 1, 2)))
            if len(out_names) > 1:  # e.g. segment: output0 preds + output1 protos (NCHW -> NHWC)
                outs = net.forward(out_names)
                preds = outs[0].transpose(0, 2, 1) if outs[0].ndim == 3 else outs[0]
                rest = [o.transpose(0, 2, 3, 1) if o.ndim == 4 else o for o in outs[1:]]
                return [preds, *rest]
            out = net.forward()
            return out.transpose(0, 2, 1) if out.ndim == 3 else out

        self._call = call

    def _init_tflite(self):
        import tensorflow as tf

        interp = tf.lite.Interpreter(model_path=str(self.path))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        outs = interp.get_output_details()

        def call(x):
            interp.set_tensor(inp["index"], np.asarray(x, np.float32))
            interp.invoke()
            res = [interp.get_tensor(o["index"]) for o in outs]
            return res[0] if len(res) == 1 else res

        self._call = call
        self.model = None
        base = Path(str(self.path)[: -len(".tflite")])
        npz = base.with_suffix(".npz")
        if npz.exists():
            hdrdata = np.load(npz, allow_pickle=False)
            hdr = json.loads(bytes(hdrdata["__header__"]).decode())
            self.meta.setdefault("names", hdr.get("names"))
            self.meta.setdefault("task", hdr.get("task"))
            self.meta.setdefault("stride", hdr.get("stride"))

    # -- uniform surface ----------------------------------------------------------
    @property
    def names(self):
        n = self.meta.get("names") or {}
        return {int(k): v for k, v in n.items()} if isinstance(n, dict) else dict(enumerate(n))

    @property
    def nc(self):
        return int(self.meta.get("nc") or len(self.names) or 80)

    @property
    def task(self):
        return self.meta.get("task", "detect")

    @property
    def stride(self):
        return np.atleast_1d(np.asarray(self.meta.get("stride") or [32.0], np.float32))

    def __call__(self, x):
        """x: (B, H, W, 3) float32 in [0, 1] -> raw predictions."""
        return self._call(x)

    def warmup(self, imgsz=(1, 64, 64, 3)):
        x = np.zeros(imgsz, np.float32)
        out = self._call(x)
        import jax

        jax.tree_util.tree_map(np.asarray, out)
        return self
