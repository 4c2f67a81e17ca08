"""MFU avenue (a) probe: Pallas one-pass BN-stat accumulation vs XLA's reduce.

Context (VERDICT r4 next #4): post-lane_pad, bn-stats/reduce is ~26% of the
flagship dense train step (64 ms/step, tools/xprof_breakdown.py r5 trace) —
the per-BN batch-statistic reductions over the 320^2/160^2 x 128-lane P1/P2
activations plus their backward counterparts. This probe answers whether a
hand-written Pallas accumulation kernel can beat XLA's fused multi-output
reduce on the EXACT shapes the step runs, or whether those reductions already
ride at the machine's empirical HBM roof (~230-280 GB/s, ROUND3.md §3b) and
the only real win would be removing the pass entirely (a full Pallas conv
with stat epilogue — not attempted: XLA's convs at these shapes are <1% of
the step, so a from-scratch conv kernel must match cuDNN-class schedules just
to break even on the conv part).

Run (TPU): python tools/bn_stat_probe.py
Prints one row per shape: XLA ms, Pallas ms, GB/s each, verdict.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [  # (B, H, W, C): the lane-padded P1/P2/P3 BN sites of the flagship
    (32, 320, 320, 128),
    (32, 160, 160, 128),
    (32, 80, 80, 128),
]


def xla_stats(x):
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(0, 1, 2)), jnp.sum(xf * xf, axis=(0, 1, 2))


def make_pallas_stats(shape, ht: int = 16):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b, h, w, c = shape
    assert h % ht == 0

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        x = x_ref[...].astype(jnp.float32)
        s = jnp.sum(x, axis=(0, 1, 2))
        s2 = jnp.sum(x * x, axis=(0, 1, 2))
        blk = jnp.stack([s, s2])  # (2, C) f32

        @pl.when(i == 0)
        def _init():
            o_ref[...] = blk

        @pl.when(i > 0)
        def _acc():
            o_ref[...] += blk

    grid = (b * (h // ht),)

    def call(x):
        xr = x.reshape(b * (h // ht), ht, w, c)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, ht, w, c), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        )(xr)
        return out[0], out[1]

    return call


def bench(fn, x, iters=30):
    import jax

    f = jax.jit(fn)
    s, s2 = f(x)
    _ = np.asarray(s)  # completion fence (axon: block_until_ready unreliable)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, s2 = f(x)
    _ = np.asarray(s2)
    return (time.perf_counter() - t0) / iters, (np.asarray(s), np.asarray(s2))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    rng = np.random.default_rng(0)
    for shape in SHAPES:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(jnp.bfloat16)
        gb = x.size * 2 / 1e9
        t_x, (sx, s2x) = bench(xla_stats, x)
        t_p, (sp, s2p) = bench(make_pallas_stats(shape), x)
        # exactness: both accumulate f32 over the same bf16 values; block order
        # differs, so allow reassociation-level noise only
        rel = max(float(np.abs(sx - sp).max() / (np.abs(sx).max() + 1e-9)),
                  float(np.abs(s2x - s2p).max() / (np.abs(s2x).max() + 1e-9)))
        verdict = "pallas" if t_p < t_x * 0.95 else ("tie" if t_p < t_x * 1.05 else "xla")
        print(
            f"{shape}: xla {t_x * 1e3:7.3f} ms ({gb / t_x:6.1f} GB/s) | "
            f"pallas {t_p * 1e3:7.3f} ms ({gb / t_p:6.1f} GB/s) | rel-err {rel:.2e} | winner: {verdict}",
            flush=True,
        )


if __name__ == "__main__":
    main()
