"""Profiling: jax.profiler traces + per-layer timing/FLOPs.

Capability parity with the reference's tracing stack (SURVEY.md §5.1): Profile
timers live in predictor/validator; this module adds the device-level tracer
(the reference has no XLA-level equivalent — thop + CUDA-sync timers only).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER


@contextlib.contextmanager
def trace(logdir: str = "runs/profile"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f"profiler trace written to {logdir}")


def profile_layers(model, variables, imgsz: int = 640, n: int = 3, dtype=None):
    """Per-layer wall time + output shape (reference BaseModel._profile_one_layer).

    Runs the graph layer by layer with host sync between layers — diagnostic
    only (the fused jit program is what production runs).
    """
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M

    ctx_dtype = dtype or jnp.float32
    x = jnp.zeros((1, imgsz, imgsz, model.ch), jnp.float32)
    rows = []
    y = []
    out = x
    for spec in model.layers:
        f = spec.f
        xin = out if f == -1 else (y[f] if isinstance(f, int) else [out if j == -1 else y[j] for j in f])
        fn = jax.jit(lambda v, xi, mod=spec.module: mod(v, xi, M.Ctx(train=False, dtype=ctx_dtype)))
        v = variables.get(str(spec.i), {})
        out = fn(v, xin)
        jax.tree_util.tree_map(lambda a: np.asarray(a) if hasattr(a, "shape") and a.size < 4 else None, out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(v, xin)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        np.asarray(leaf.reshape(-1)[:1])
        dt = (time.perf_counter() - t0) / n * 1e3
        shape = getattr(out, "shape", type(out).__name__)
        rows.append({"i": spec.i, "type": spec.type, "ms": round(dt, 3), "shape": str(shape)})
        y.append(out if spec.i in model.save else None)
        LOGGER.info(f"{spec.i:>3} {spec.type:<18} {dt:8.3f} ms  {shape}")
    return rows
