"""Custom backward pass for stride-2 convolutions on TPU.

Why this exists: XLA lowers the gradients of a stride-2 conv by dim-splitting
the spatial dims into (W/2, 2) sub-grids and re-laying-out the operands. At the
small channel counts of a detector's early levels (C=3..64 on 320^2/160^2
activations) those relayouts are physical transposes of 100-650 MB tensors and
dominate the train step: xprof on the flagship (yolov8s-p2-repvgg-sf, b32,
640px) attributes 69% of device time to layout/copy, most of it around the
stride-2 backward (see ROUND3.md and tools/xprof_breakdown.py). The MXU work
itself is ~6%.

This module reformulates both gradients in layout-preserving terms:

* **wgrad** — for each of the k*k taps, the weight gradient is a single big
  contraction over (B, Ho, Wo):

      dW[ky,kx,ci,co] = sum_{b,i,j} Xpad[b, 2i+ky, 2j+kx, ci] * dY[b,i,j,co]

  expressed as `k*k` strided slices of the padded input feeding fp32-
  accumulating einsums (plain MXU dots, NO dim-split, no relayout of X).

* **dx (data grad)** — the transposed conv scatters each dY pixel onto a k x k
  neighbourhood of dX with stride 2. Split dX by output parity class
  (y%2, x%2): each class is a *stride-1* conv of dY with a 1- or 2-tap
  sub-kernel of W (taps ky with (ky - p) % 2 == y % 2), and the four class
  results interleave back with one reshape (the stack/concat is the only data
  movement, and it is a contiguous-minor-dim merge, not a transpose).

Covers k in {1, 3}, stride 2, padding in {0, 1}, dilation 1, arbitrary
`feature_group_count` (incl. depthwise) — every stride-2 site in the v8/v9/v10
/flagship zoos. Forward is the stock `lax.conv_general_dilated` (unchanged
numerics and speed); only the VJP is replaced. Gradient accuracy is *higher*
than the stock path (fp32 einsum accumulation vs bf16 conv output); equality
vs the stock backward is asserted to ~1e-2 bf16 resolution in
tests/test_conv_s2.py and measured on-chip by tools/s2grad_probe.py.

Reference behavior being replaced: torch's cudnn stride-2 wgrad/dgrad kernels
(implicit in ultralytics Conv, reference conv.py:37); this is the TPU-native
answer to the same hot path.

MEASURED VERDICT (v5e, tools/s2grad_probe.py, b32 flagship shapes): both
custom formulations LOSE to XLA's stock dim-split backward in isolation —
the einsum form 4-6x slower (dy re-read per tap; tiny-output reductions), the
Pallas fused kernel (ops/pallas_s2bwd.py, DYT_S2GRAD=pallas) ~10x slower
(Mosaic lowers the strided in-VMEM selects on lane-padded small-Ci data as
VPU shuffles that stream far below the ~250 GB/s HBM rate the stock copies
get). Both are kept as correctness-tested opt-ins (DYT_S2GRAD=1 / =pallas);
the default stays stock autodiff. The honest conclusion for ROUND3.md: on
this chip/toolchain the dim-split relayouts around stride-2 backward are the
best known schedule, and the flagship's layout-bound step cost is structural.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["conv2d_s2", "S2_GRAD_KINDS"]

# Supported (kernel, padding) combos for the custom backward.
S2_GRAD_KINDS = {(1, 0), (3, 1)}


def _raw_conv_s2(x, w, p: int, g: int):
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(2, 2),
        padding=((p, p), (p, p)),
        feature_group_count=g,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _wgrad(x, dy, k: int, p: int, g: int, w_dtype):
    """dW[ky,kx,cig,co] via k*k strided-slice einsums, fp32 accumulation."""
    b, h, wd, ci = x.shape
    _, ho, wo, co = dy.shape
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    cig = ci // g
    cog = co // g
    xg = x.reshape(b, h + 2 * p, wd + 2 * p, g, cig)
    dyg = dy.reshape(b, ho, wo, g, cog)
    taps = []
    for ky in range(k):
        row = []
        for kx in range(k):
            xs = jax.lax.slice(
                xg,
                (0, ky, kx, 0, 0),
                (b, ky + 2 * (ho - 1) + 1, kx + 2 * (wo - 1) + 1, g, cig),
                (1, 2, 2, 1, 1),
            )
            # (g, cig, cog) — one MXU dot per tap, contraction over B*Ho*Wo
            row.append(
                jnp.einsum(
                    "bhwgc,bhwgd->gcd",
                    xs,
                    dyg,
                    preferred_element_type=jnp.float32,
                )
            )
        taps.append(jnp.stack(row))
    dwg = jnp.stack(taps)  # (k, k, g, cig, cog)
    dw = dwg.transpose(0, 1, 3, 2, 4).reshape(k, k, cig, co)
    return dw.astype(w_dtype)


def _parity_taps(k: int, p: int, parity: int) -> Sequence[tuple[int, int]]:
    """Taps (ky, t) contributing to output rows y = 2r + parity.

    y = 2i + ky - p  =>  ky with (ky - p) % 2 == parity, reading dY row
    i = r + t where t = (parity + p - ky) // 2 + ... derived below.
    Returns [(ky, dy_row_offset_from_r)] in increasing offset order.
    """
    taps = []
    for ky in range(k):
        if (ky - p) % 2 != parity % 2:
            continue
        # y = 2i + ky - p and y = 2r + parity  =>  i = r + (parity - ky + p) // 2
        off = (parity - ky + p) // 2
        taps.append((ky, off))
    return sorted(taps, key=lambda t: t[1])


def _dxgrad(dy, w, k: int, p: int, g: int, h: int, wd: int, x_dtype):
    """dX via 4 parity-class stride-1 convs over dY + one interleaving reshape."""
    b, ho, wo, co = dy.shape
    cig = w.shape[2]
    ci = cig * g
    cog = co // g
    wt = w.astype(x_dtype)
    # Transposed kernel pieces: K[ky,kx][..., co_g, ci_g] with HWIO = (co->ci).
    # Build (g, cig, cog) -> grouped HWIO (kh, kw, cog, ci) for the parity conv
    # (input channels = co, output channels = ci, same grouping).
    wg = wt.reshape(k, k, cig, g, cog)

    subs = {}
    for py in (0, 1):
        ty = _parity_taps(k, p, py)
        for px in (0, 1):
            tx = _parity_taps(k, p, px)
            if not ty or not tx:
                subs[(py, px)] = jnp.zeros((b, ho, wo, ci), x_dtype)
                continue
            offs_y = [t[1] for t in ty]
            offs_x = [t[1] for t in tx]
            kh, kw = len(ty), len(tx)
            # kernel[t_idx, s_idx, cog, ci]: tap (ky, kx) contributes
            # w[ky, kx, cig_idx, gi*cog + cog_idx] to dx channel gi*cig + cig_idx
            kern = jnp.zeros((kh, kw, cog, ci), x_dtype)
            for ti, (ky, _) in enumerate(ty):
                for si, (kx, _) in enumerate(tx):
                    # (cig, g, cog) -> (cog, g, cig) -> (cog, g*cig) grouped-HWIO slot
                    kern = kern.at[ti, si].set(wg[ky, kx].transpose(2, 1, 0).reshape(cog, ci))
            # dX_sub[r] = sum_t kern[t] . dY[r + off_t]; conv padding picks the offsets:
            # pad_lo = -min_off, pad_hi = max_off (reads past the end are zeros).
            pad_y = (-offs_y[0], offs_y[-1])
            pad_x = (-offs_x[0], offs_x[-1])
            subs[(py, px)] = jax.lax.conv_general_dilated(
                dy,
                kern,
                window_strides=(1, 1),
                padding=(pad_y, pad_x),
                feature_group_count=g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

    row0 = jnp.stack([subs[(0, 0)], subs[(0, 1)]], axis=3)  # (B,Ho,Wo,2,Ci)
    row1 = jnp.stack([subs[(1, 0)], subs[(1, 1)]], axis=3)
    grid = jnp.stack([row0, row1], axis=2)  # (B,Ho,2,Wo,2,Ci)
    dx = grid.reshape(b, 2 * ho, 2 * wo, ci)
    if 2 * ho != h or 2 * wo != wd:  # odd input: last row/col receives no gradient
        dx = dx[:, :h, :wd, :]
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_s2(x, w, p: int = 1, g: int = 1):
    """Stride-2 NHWC/HWIO conv with a layout-preserving custom backward.

    Exact same forward as `lax.conv_general_dilated(..., strides=(2,2))`;
    the VJP avoids XLA's dim-split lowering (see module docstring).
    """
    return _raw_conv_s2(x, w, p, g)


def _fwd(x, w, p: int, g: int):
    return _raw_conv_s2(x, w, p, g), (x, w)


def _bwd(p: int, g: int, res, dy):
    x, w = res
    k = w.shape[0]
    if (
        os.environ.get("DYT_S2GRAD") == "pallas"
        and g == 1
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
        and jax.default_backend() in ("tpu", "axon")
    ):
        from drone_yolo_tpu.ops.pallas_s2bwd import HAS_PALLAS, s2_bwd

        if HAS_PALLAS:
            dx, dw = s2_bwd(x, w, dy, k=k)
            return dx, dw.astype(w.dtype)
    dw = _wgrad(x, dy, k, p, g, w.dtype)
    dx = _dxgrad(dy, w, k, p, g, x.shape[1], x.shape[2], x.dtype)
    return dx, dw


conv2d_s2.defvjp(_fwd, _bwd)
