"""Probe: stride-2 conv backward formulations on TPU.

The flagship train step is 69% layout/copy (tools/xprof_breakdown.py), almost
all of it around XLA's dim-split lowering of stride-2 conv gradients at small
channel counts (320^2/160^2 activations, C=16..64): the wgrad splits W into
(W/2, 2) sub-grids (bf16[32,320,320,16,2] relayout copies, 5-11 ms each) and
the data grad is a lhs_dilated conv with its own transposes.

This probe times, per representative flagship layer, fwd+bwd of a scalar loss
through:
  a) the stock jax.lax.conv_general_dilated autodiff path
  b) custom VJP: wgrad = 9 strided-slice einsums (MXU dots, no dim-split),
     dx = 4 parity-class stride-1 convs over dy + one interleave transpose
  c) PROBE_IMPL=pallas: the fused Pallas kernel (ops/pallas_s2bwd.py)

Measured (v5e, b32): stock wins — einsum 4-6x slower, pallas ~10x slower;
see the conv_s2.py module docstring for the analysis. The probe stays as the
regression harness for future formulations.

Run: python tools/s2grad_probe.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    from drone_yolo_tpu.ops.conv_s2 import conv2d_s2

    def conv_ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # Representative flagship stride-2 sites at b32/640px (C_in, C_out, H):
    cases = [
        ("stem 3->32 @640", 3, 32, 640),
        ("repvgg1 32->64 @320", 32, 64, 320),
        ("repvgg2 64->128 @160", 64, 128, 160),
        ("repvgg3 128->256 @80", 128, 256, 80),
        ("head-ds 64->64 @160", 64, 64, 160),
    ]
    b = int(os.environ.get("PROBE_BATCH", 32))
    iters = int(os.environ.get("PROBE_ITERS", 20))

    for name, ci, co, h in cases:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, h, h, ci), np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co), np.float32) * 0.1, jnp.float32)
        dy = jnp.asarray(rng.standard_normal((b, h // 2, h // 2, co), np.float32), jnp.bfloat16)

        def loss_of(conv_fn):
            def f(x, w):
                y = conv_fn(x, w)
                return jnp.sum(y * dy.astype(y.dtype))
            return jax.jit(jax.grad(f, argnums=(0, 1)))

        g_ref = loss_of(conv_ref)
        if os.environ.get("PROBE_IMPL") == "pallas":
            from drone_yolo_tpu.ops.pallas_s2bwd import s2_bwd

            def g_cus(x, w):
                return jax.jit(lambda x, w: s2_bwd(x, w, dy, k=3))(x, w)
        else:
            g_cus = loss_of(lambda x, w: conv2d_s2(x, w, 1))

        # numerics check (fp32 path on small slice)
        dx_r, dw_r = g_ref(x, w)
        dx_c, dw_c = g_cus(x, w)
        err_w = float(jnp.max(jnp.abs(dw_r.astype(jnp.float32) - dw_c.astype(jnp.float32))))
        err_x = float(jnp.max(jnp.abs(dx_r.astype(jnp.float32) - dx_c.astype(jnp.float32))))
        scale_w = float(jnp.max(jnp.abs(dw_r))) + 1e-9
        scale_x = float(jnp.max(jnp.abs(dx_r))) + 1e-9

        def bench(fn):
            out = fn(x, w)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x, w)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / iters * 1e3

        t_ref = bench(g_ref)
        t_cus = bench(g_cus)
        print(
            f"{name:24s} ref {t_ref:7.2f} ms  custom {t_cus:7.2f} ms  "
            f"speedup {t_ref / t_cus:5.2f}x  relerr dw {err_w / scale_w:.2e} dx {err_x / scale_x:.2e}"
        )


if __name__ == "__main__":
    main()
