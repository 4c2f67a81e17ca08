"""Split the train step cost: model fwd+bwd vs loss(TAL/DFL/CIoU) fwd+bwd.

Times three jitted variants on the chip:
  full  — real step (model + v8DetectionLoss), the number train_profile reports
  model — model fwd+bwd with a surrogate sum() loss (no assigner/DFL)
  loss  — v8DetectionLoss fwd+bwd over FIXED head outputs (no model)

full - model ≈ what the loss machinery costs inside the step.

Run: PROF_MODEL=yolov8s-p2-repvgg-sf.yaml PROF_BATCHES=32 python tools/split_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.loss import v8DetectionLoss

    imgsz = int(os.environ.get("PROF_IMGSZ", 640))
    model_name = os.environ.get("PROF_MODEL", "yolov8s-p2-repvgg-sf.yaml")
    batch = int(os.environ.get("PROF_BATCHES", 32))
    iters = int(os.environ.get("PROF_ITERS", 8))

    model = DetectionModel(model_name, nc=4)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    criterion = v8DetectionLoss(model)

    rng = np.random.default_rng(0)
    host = {
        "img": rng.random((batch, imgsz, imgsz, 3), np.float32).astype(np.float32),
        "cls": np.zeros((batch, 32), np.float32),
        "bboxes": np.tile(np.array([10, 10, 100, 100], np.float32), (batch, 32, 1)),
        "mask": np.ones((batch, 32), np.float32),
    }
    dev = jax.device_put({k: jnp.asarray(v) for k, v in host.items()})

    def time_step(fn, *args):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def full(params, b):
        def loss_fn(p):
            ctx = M.Ctx(train=True, dtype=jnp.bfloat16, targets=b, rng=jax.random.PRNGKey(0))
            out = model.apply(p, b["img"], ctx=ctx)
            loss, items = criterion(out, b)
            return loss, items

        (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return jax.tree_util.tree_map(lambda p, g: p - 0.01 * g.astype(p.dtype), params, grads), loss

    @jax.jit
    def model_only(params, b):
        def loss_fn(p):
            ctx = M.Ctx(train=True, dtype=jnp.bfloat16, targets=b, rng=jax.random.PRNGKey(0))
            out = model.apply(p, b["img"], ctx=ctx)
            return sum(jnp.sum(f.astype(jnp.float32)) for f in jax.tree_util.tree_leaves(out))

        grads = jax.grad(loss_fn)(params)
        return jax.tree_util.tree_map(lambda p, g: p - 0.01 * g.astype(p.dtype), params, grads)

    # fixed head outputs with realistic shapes, loss-only fwd+bwd wrt them
    ctx0 = M.Ctx(train=True, dtype=jnp.bfloat16, targets=dev, rng=jax.random.PRNGKey(0))
    feats0 = model.apply(variables, dev["img"], ctx=ctx0)
    feats0 = jax.tree_util.tree_map(jax.lax.stop_gradient, feats0)

    @jax.jit
    def loss_only(feats, b):
        def loss_fn(f):
            loss, items = criterion(f, b)
            return loss

        g = jax.grad(loss_fn)(feats)
        return jax.tree_util.tree_leaves(g)[0].sum()

    t_full = time_step(full, variables, dev)
    t_model = time_step(model_only, variables, dev)
    t_loss = time_step(loss_only, feats0, dev)
    print(
        json.dumps(
            {
                "metric": f"split_{model_name.split('.')[0]}_{imgsz}px_b{batch}",
                "full_ms": round(t_full, 1),
                "model_fwd_bwd_ms": round(t_model, 1),
                "loss_only_ms": round(t_loss, 1),
                "loss_overhead_in_step_ms": round(t_full - t_model, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
