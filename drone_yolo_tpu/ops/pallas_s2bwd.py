"""Pallas TPU kernel: fused backward pass for dense stride-2 convolutions.

Why: XLA lowers stride-2 conv gradients by dim-splitting spatial dims into
(W/2, 2) sub-grids, materializing physical relayout copies of the 100-650 MB
early-level activations; on the flagship (yolov8s-p2-repvgg-sf, b32, 640px)
that machinery is ~25 ms of a 168 ms train step while the MXU work is ~6%
(ROUND3.md, tools/xprof_breakdown.py). The machine's empirical HBM streaming
rate is ~250 GB/s, so the win is traffic removal: this kernel reads x and dy
~once (plus a ~1/HT-sized halo side-channel), writes dx once, and keeps the
weight gradient resident in VMEM across the whole sequential grid.

Structure (one grid program = one batch image x one tile of HT dy rows):
  * All operands are auto-pipelined blocked inputs. Halo rows (the x rows
    2*i0-1 / 2*i0+2*HT and dy row i0+HT needed across tile boundaries) cannot
    be expressed as non-overlapping blocks, and Mosaic's HBM DMA requires
    128-multiple minor dims (probed), so the caller pre-slices them into tiny
    (B, nTiles, 1-row) arrays (~1/HT of the tensor) with zero rows at the
    image edges standing in for the conv padding — no in-kernel masking.
  * wgrad: build an im2col band A (HT*Wo, 9*Ci) from 9 static shifted/strided
    views of the x band (in-VMEM moves) and accumulate dW += A^T @ D (one
    packed MXU dot, fp32) into the dw output block, whose constant index map
    keeps it resident in VMEM until the final flush.
  * dx: one packed MXU dot G = Dh @ Wt (Co -> 9*Ci) over the dy halo band,
    then assemble the four output-parity classes from statically shifted
    slices of G (each dx parity class receives 1/2/2/4 taps; derivation in
    `_k3_kernel`). Mosaic cannot interleave along the second-minor (W) axis
    (probed), so dx is emitted column-parity-split as (B, H, 2, Wo, Ci) and
    the caller restores (B, H, W, Ci) with one XLA transpose — one extra
    streaming pass, still several fewer than the dim-split lowering.

Forward is untouched (stock lax.conv); only the VJP changes, so forward
numerics and checkpoint layout are identical. Gradient equality vs stock
autodiff is asserted in tests/test_conv_s2.py (interpret mode) and on-chip by
tools/s2grad_probe.py.

Covers k=3 p=1 and k=1 p=0, stride 2, dilation 1, groups == 1, even H/W —
every dense stride-2 site in the v8/v9/v10/flagship zoos (the reference's
cudnn wgrad/dgrad kernels, ultralytics conv.py:37, are the CUDA analog).
Grouped/depthwise sites keep the stock path.

Mosaic layout notes (probed on v5e): leading-dim merges/splits are legal when
the second-minor dim stays even; second-minor slices at odd offsets and lane
slices at Ci granularity are legal; creating/merging a (..., 2, C) minor pair,
interleaving along W, lane-regroup reshapes, and sub-128-lane HBM DMA are NOT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/CPU-interpret only; import is gated like ops/pallas_nms.py
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _pick_ht(ho: int, cap: int) -> int:
    """Largest divisor of `ho` that is <= cap (grid tiles must cover exactly)."""
    for d in range(min(cap, ho), 0, -1):
        if ho % d == 0:
            return d
    return 1


def _k3_kernel(x_ref, xt_ref, xb_ref, dy_ref, dn_ref, wt_ref, dx_ref, dw_ref, *, HT, W, Wo, Ci, Co):
    b = pl.program_id(0)
    i = pl.program_id(1)
    Wp = Wo + 2  # dy band width: Wo data cols + 1 halo col + 1 even-ness pad

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # ---- assemble the padded x band (2HT+2, W+2, Ci) ----
    xv = x_ref[0]  # (2HT, W, Ci)
    band = jnp.concatenate([xt_ref[0, 0][None], xv, xb_ref[0, 0][None]], axis=0)
    zc = jnp.zeros((2 * HT + 2, 1, Ci), band.dtype)
    bandp = jnp.concatenate([zc, band, zc], axis=1)  # (2HT+2, W+2, Ci)

    # ---- dy band with +1 row halo and 2 zero cols (halo col + even pad) ----
    dyv = dy_ref[0]  # (HT, Wo, Co)
    dband = jnp.concatenate([dyv, dn_ref[0, 0][None]], axis=0)  # (HT+1, Wo, Co)
    dbandp = jnp.concatenate([dband, jnp.zeros((HT + 1, 2, Co), dband.dtype)], axis=1)

    # ---- wgrad: im2col band + one packed MXU dot (fp32 accumulate) ----
    cols = []
    for ky in range(3):
        rows = bandp[ky : ky + 2 * HT].reshape(HT, 2, W + 2, Ci)[:, 0]  # (HT, W+2, Ci)
        for kx in range(3):
            cols.append(rows[:, kx : kx + 2 * Wo].reshape(HT, Wo, 2, Ci)[:, :, 0])
    a = jnp.concatenate(cols, axis=-1).reshape(HT * Wo, 9 * Ci)
    d = dyv.reshape(HT * Wo, Co)
    dw = jax.lax.dot_general(a, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw_ref[...] += dw.reshape(3, 3, Ci, Co)

    # ---- dx: packed transposed dot over the dy halo band ----
    # wt_ref: (Co, 9*Ci), tap t=(ky*3+kx) occupying lanes [t*Ci, (t+1)*Ci)
    # g cast to the activation dtype right after the (fp32) MXU accumulation:
    # the parity assembly below adds at most 4 terms, same as the stock bf16
    # conv output; keeping g fp32 would 2x the largest VMEM temporaries.
    g = (
        jax.lax.dot_general(
            dbandp.reshape((HT + 1) * Wp, Co), wt_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        .astype(dx_ref.dtype)
        .reshape(HT + 1, Wp, 9 * Ci)
    )

    def tap(ky, kx, dr, dc):
        t = ky * 3 + kx
        return g[dr : dr + HT, dc : dc + Wo, t * Ci : (t + 1) * Ci]  # (HT, Wo, Ci)

    # dx row y = 2(i0+r)+py, col s = 2j+px; y = 2i+ky-1 selects (ky, dy row):
    #   even rows: ky=1 @ dy[i0+r];  odd rows: ky=0 @ dy[i0+r+1], ky=2 @ dy[i0+r]
    # and the same relation along columns with kx / j.
    ee = tap(1, 1, 0, 0)
    eo = tap(1, 0, 0, 1) + tap(1, 2, 0, 0)
    oe = tap(0, 1, 1, 0) + tap(2, 1, 0, 0)
    oo = tap(0, 0, 1, 1) + tap(0, 2, 1, 0) + tap(2, 0, 0, 1) + tap(2, 2, 0, 0)

    # column-parity-split layout: rows interleave via a leading-dim stack+merge
    # (legal); columns stay split for the caller-side transpose.
    even_cols = jnp.stack([ee, oe], axis=1).reshape(2 * HT, Wo, Ci)
    odd_cols = jnp.stack([eo, oo], axis=1).reshape(2 * HT, Wo, Ci)
    dx = jnp.stack([even_cols, odd_cols], axis=1)  # (2HT, 2, Wo, Ci)
    dx_ref[...] = dx.reshape(1, 2 * HT, 2, Wo, Ci).astype(dx_ref.dtype)


def _k1_kernel(x_ref, dy_ref, wt_ref, dx_ref, dw_ref, *, HT, W, Wo, Ci, Co):
    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    xv = x_ref[0]  # (2HT, W, Ci)
    dyv = dy_ref[0]  # (HT, Wo, Co)

    a = xv.reshape(HT, 2, W, Ci)[:, 0].reshape(HT, Wo, 2, Ci)[:, :, 0].reshape(HT * Wo, Ci)
    d = dyv.reshape(HT * Wo, Co)
    dw = jax.lax.dot_general(a, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw_ref[...] += dw.reshape(1, 1, Ci, Co)

    g = jax.lax.dot_general(d, wt_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    g = g.astype(dx_ref.dtype).reshape(HT, Wo, Ci)
    z = jnp.zeros_like(g)
    even_cols = jnp.stack([g, z], axis=1).reshape(2 * HT, Wo, Ci)  # odd rows zero
    odd_cols = jnp.zeros((2 * HT, Wo, Ci), g.dtype)
    dx = jnp.stack([even_cols, odd_cols], axis=1)
    dx_ref[...] = dx.reshape(1, 2 * HT, 2, Wo, Ci).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "interpret", "ht_cap"))
def s2_bwd(x, w, dy, k: int = 3, interpret: bool = False, ht_cap: int = 8):
    """Fused (dx, dw) for a dense stride-2 conv. k=3 implies p=1; k=1 implies p=0.

    x: (B,H,W,Ci) bf16/f32, w: (k,k,Ci,Co), dy: (B,Ho,Wo,Co) same dtype as x.
    Returns dx (B,H,W,Ci) x.dtype, dw (k,k,Ci,Co) float32.
    """
    B, H, W, Ci = x.shape
    _, Ho, Wo, Co = dy.shape
    assert H == 2 * Ho and W == 2 * Wo, "even spatial dims required"
    # lane padding (Ci -> 128) multiplies VMEM temporaries; keep the per-tile
    # working set roughly constant by shrinking the row tile at small Ci/big W
    eff_cap = ht_cap
    while eff_cap > 2 and W * eff_cap > 1280:
        eff_cap //= 2
    HT = _pick_ht(Ho, eff_cap)
    nH = Ho // HT
    # packed transposed weights: (Co, k*k*Ci), tap-major lanes
    wt = jnp.transpose(w.astype(x.dtype), (3, 0, 1, 2)).reshape(Co, k * k * Ci)
    grid = (B, nH)
    out_specs = [
        pl.BlockSpec((1, 2 * HT, 2, Wo, Ci), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM),
        # constant index map: the dw block stays resident in VMEM across the
        # sequential grid and is flushed once at the end
        pl.BlockSpec((k, k, Ci, Co), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, H, 2, Wo, Ci), x.dtype),  # column-parity split
        jax.ShapeDtypeStruct((k, k, Ci, Co), jnp.float32),
    ]

    if k == 3:
        # halo side-channels (~1/HT of the tensors), zero rows at image edges
        # standing in for the conv padding / past-the-end reads:
        #   xtop[:, i] = x row 2*HT*i - 1   (zeros at i == 0)
        #   xbot[:, i] = x row 2*HT*(i+1)   (zeros at i == nH-1)
        #   dnxt[:, i] = dy row HT*(i+1)    (zeros at i == nH-1)
        zx = jnp.zeros((B, 1, W, Ci), x.dtype)
        xtop = jnp.concatenate([zx, x[:, 2 * HT - 1 :: 2 * HT][:, : nH - 1]], axis=1)
        xbot = jnp.concatenate([x[:, 2 * HT :: 2 * HT][:, : nH - 1], zx], axis=1)
        dnxt = jnp.concatenate(
            [dy[:, HT::HT][:, : nH - 1], jnp.zeros((B, 1, Wo, Co), dy.dtype)], axis=1
        )
        dxp, dw = pl.pallas_call(
            functools.partial(_k3_kernel, HT=HT, W=W, Wo=Wo, Ci=Ci, Co=Co),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2 * HT, W, Ci), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, Ci), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, Ci), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HT, Wo, Co), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Wo, Co), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # packed wt
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x, xtop, xbot, dy, dnxt, wt)
    else:
        dxp, dw = pl.pallas_call(
            functools.partial(_k1_kernel, HT=HT, W=W, Wo=Wo, Ci=Ci, Co=Co),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2 * HT, W, Ci), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HT, Wo, Co), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(x, dy, wt)
    # restore (B, H, W, Ci): one XLA transpose-copy (the only extra pass)
    dx = dxp.transpose(0, 1, 3, 2, 4).reshape(B, H, W, Ci)
    return dx, dw
