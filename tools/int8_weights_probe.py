#!/usr/bin/env python
"""Weight-only int8 inference probe (VERDICT r3 next #5).

Per-output-channel symmetric int8 quantization of every fused conv kernel
(scale = max|w| / 127 per channel), dequantized to the compute dtype inside
the jitted forward. Zero activation quantization -> zero accuracy-relevant
risk beyond the ~0.4% weight rounding (reported as output delta below).

What this CAN win: halved weight *storage* and halved weight HBM fetch — but
only if the dequant fuses into the conv's operand read. XLA materializes conv
operands, so the dequantized bf16 kernel is written+read from HBM anyway; the
hypothesis being tested is whether the (weights ≪ activations) traffic even
matters at batch sizes that saturate the chip. Run on the axon TPU:

  python tools/int8_weights_probe.py           # flagship b128 + b1 rows
  INT8_MODEL=yolov8s.yaml INT8_BATCHES=256 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def quantize_tree(tree):
    """Fused-variables pytree -> (int8 pytree with per-channel scales, stats)."""
    import jax.numpy as jnp

    n_q = 0

    def q(leaf_path, leaf):
        nonlocal n_q
        if leaf.ndim == 4 and leaf.shape[0] <= 7 and leaf.shape[1] <= 7:  # HWIO conv kernel
            w = np.asarray(leaf, np.float32)
            scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0  # per-output-channel
            scale = np.where(scale == 0, 1.0, scale)
            wi = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            n_q += 1
            return {"_int8": jnp.asarray(wi), "_scale": jnp.asarray(scale.astype(np.float32))}
        return leaf

    def walk(node, path=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        return q(path, node)

    out = walk(tree)
    return out, n_q


def dequantize_tree(tree, dtype):
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, dict):
            if "_int8" in node:
                return (node["_int8"].astype(dtype) * node["_scale"].astype(dtype)).astype(dtype)
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(tree)


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.ops.nms import non_max_suppression

    model_name = os.environ.get("INT8_MODEL", "yolov8s-p2-repvgg-sf.yaml")
    imgsz = int(os.environ.get("INT8_IMGSZ", 640))
    iters = int(os.environ.get("INT8_ITERS", 10))
    batches = [int(b) for b in os.environ.get("INT8_BATCHES", "128,1").split(",")]

    model = DetectionModel(model_name)
    fused = model.fuse(model.init(jax.random.PRNGKey(0), imgsz=imgsz))
    qtree, n_q = quantize_tree(fused)
    print(f"{n_q} conv kernels quantized (per-output-channel int8)", file=sys.stderr)

    for batch, use_int8 in [(b, f) for b in batches for f in (False, True)]:
        @jax.jit
        def fn(params, x):
            x = x.astype(jnp.bfloat16) / 255.0
            v = dequantize_tree(params, jnp.bfloat16) if use_int8 else params
            preds, _ = model.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.bfloat16))
            return non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7, max_det=300, pre_topk=256)

        params = qtree if use_int8 else fused
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 256, (batch, imgsz, imgsz, 3), np.uint8))
        dets, n = fn(params, x)
        _ = np.asarray(n)
        t0 = time.perf_counter()
        for _ in range(iters):
            dets, n = fn(params, x)
        _ = np.asarray(n)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"int8w_{'on' if use_int8 else 'off'}_{model_name.split('.')[0]}_b{batch}",
            "img_per_s": round(batch * iters / dt, 1),
            "ms_per_batch": round(dt / iters * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
