"""Train-step profiling on the real TPU chip (VERDICT item 7).

Measures steady-state train img/s for v8s at several batch sizes, estimates MFU
from the XLA-reported HLO FLOPs of the compiled step (fwd+bwd+optimizer), and
optionally records a jax.profiler trace.

Run (axon TPU): python tools/train_profile.py [--trace]
Prints one JSON line per batch size.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for direct invocation

V5E_BF16_PEAK_TFLOPS = 197.0  # per chip


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp

    from drone_yolo_tpu.engine.trainer import BaseTrainer  # noqa: F401 (import parity)
    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.loss import v8DetectionLoss
    from drone_yolo_tpu.utils.optimizer import sgd_step  # noqa: F401

    imgsz = int(os.environ.get("PROF_IMGSZ", 640))
    model_name = os.environ.get("PROF_MODEL", "yolov8s.yaml")
    batches = [int(b) for b in os.environ.get("PROF_BATCHES", "16,32,64").split(",")]
    iters = int(os.environ.get("PROF_ITERS", 8))
    trace = "--trace" in sys.argv

    model = DetectionModel(model_name, nc=4)
    variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)
    spd = bool(os.environ.get("PROF_SPD"))
    if spd:
        assert model.enable_spd_stem(), "stem not SPD-transformable"
    spd2 = bool(os.environ.get("PROF_SPD2"))
    if spd2:
        n = model.enable_spd_stride2()
        print(f"spd_stride2: {n} convs transformed")
    if os.environ.get("PROF_LANEPAD"):
        n = model.enable_lane_pad(
            int(os.environ.get("PROF_LANEPAD_TARGET", 128)),
            inner_target=int(os.environ["PROF_LANEPAD_INNER"]) if os.environ.get("PROF_LANEPAD_INNER") else None,
        )
        print(f"lane_pad: {n} modules padded")
        if os.environ.get("PROF_LANEPAD_STATE"):
            variables = model.pad_variables(variables, imgsz=imgsz)
            print("lane_pad: padded-state masters (pads hoisted out of the step)")
    int8w = bool(os.environ.get("PROF_INT8W"))  # weight-only int8 train-forward row (VERDICT r3 #5)
    criterion = v8DetectionLoss(model)

    def ste_int8(p):
        """Per-output-channel int8 quant-dequant of conv kernels with a
        straight-through estimator — the weight-only-int8 train forward:
        convs read (an in-graph dequant of) int8 weights; grads flow to the
        fp32 masters unchanged. Speed probe only (optimizer untouched)."""

        def q(leaf):
            if leaf.ndim == 4 and leaf.shape[0] <= 7 and leaf.shape[1] <= 7:
                scale = jnp.maximum(jnp.max(jnp.abs(leaf), axis=(0, 1, 2)), 1e-12) / 127.0
                wi = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
                return leaf + jax.lax.stop_gradient(wi.astype(leaf.dtype) * scale - leaf)
            return leaf

        return jax.tree_util.tree_map(q, p)

    for batch in batches:
        rng = np.random.default_rng(0)
        host_batch = {
            "img": rng.random((batch, imgsz, imgsz, 3), np.float32).astype(np.float32),
            "cls": np.zeros((batch, 32), np.float32),
            "bboxes": np.tile(np.array([10, 10, 100, 100], np.float32), (batch, 32, 1)),
            "mask": np.ones((batch, 32), np.float32),
        }

        @jax.jit
        def step(params, dev_batch):
            def loss_fn(p):
                ctx = M.Ctx(train=True, dtype=jnp.bfloat16, targets=dev_batch, rng=jax.random.PRNGKey(0))
                out = model.apply(ste_int8(p) if int8w else p, dev_batch["img"], ctx=ctx)
                loss, items = criterion(out, dev_batch)
                return loss, items

            (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            new_params = jax.tree_util.tree_map(lambda p, g: p - 0.01 * g.astype(p.dtype), params, grads)
            return new_params, loss

        dev_batch = jax.device_put({k: jnp.asarray(v) for k, v in host_batch.items()})
        try:
            lowered = step.lower(variables, dev_batch)
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

            params, loss = compiled(variables, dev_batch)
            _ = np.asarray(loss)  # force completion (axon: block_until_ready unreliable)
            if trace:
                jax.profiler.start_trace("/tmp/tpu_trace")
            t0 = time.perf_counter()
            for _ in range(iters):
                params, loss = compiled(params, dev_batch)
            _ = np.asarray(loss)
            dt = time.perf_counter() - t0
            if trace:
                jax.profiler.stop_trace()

            imgs_per_s = batch * iters / dt
            tflops = step_flops * iters / dt / 1e12
            print(
                json.dumps(
                    {
                        "metric": f"train_step_{model_name.split('.')[0]}{'_spd' if spd else ''}{'_int8w' if int8w else ''}_{imgsz}px_b{batch}",
                        "img_per_s": round(imgs_per_s, 1),
                        "step_ms": round(dt / iters * 1e3, 1),
                        "hlo_tflops_per_s": round(tflops, 1),
                        "mfu_pct": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
                        "step_gflops": round(step_flops / 1e9, 1),
                    }
                )
            )
        except Exception as e:  # noqa: BLE001 - report OOMs per batch size
            print(json.dumps({"metric": f"train_step_b{batch}", "error": f"{type(e).__name__}: {str(e)[:200]}"}))


if __name__ == "__main__":
    main()
