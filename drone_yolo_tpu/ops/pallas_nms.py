"""Pallas TPU kernel for greedy NMS suppression.

The XLA formulation in ops/nms.py materializes a (B, K, K) IoU matrix in HBM and
re-reads it every fixed-point iteration. This kernel keeps everything resident
in VMEM: one grid step per image computes the IoU matrix, builds the
strictly-upper-triangular suppression adjacency, and runs the fixed-point
iteration as (1, K) x (K, K) MXU matvecs against VMEM — zero HBM traffic between
iterations. K=512 uses ~2 MB of the ~16 MB VMEM budget.

Layout notes (see pallas_guide.md): candidate boxes arrive as (B, 4, K) so the
lane dimension is K (128-aligned); scalars/iota are kept >= 2-D.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

try:  # pallas is TPU/CPU-interpret only; import is gated
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except ImportError:  # pragma: no cover
    HAS_PALLAS = False


def _nms_kernel(boxes_ref, valid_ref, keep_ref, iou_scratch, thr_static):
    """One image: boxes_ref (1, 4, K); valid_ref (1, 1, K); keep_ref out (1, 1, K)."""
    k = boxes_ref.shape[2]
    x1 = boxes_ref[0, 0:1, :]  # (1, K)
    y1 = boxes_ref[0, 1:2, :]
    x2 = boxes_ref[0, 2:3, :]
    y2 = boxes_ref[0, 3:4, :]
    area = (x2 - x1) * (y2 - y1)  # (1, K)

    # pairwise IoU: rows i (reshaped to (K, 1)) vs columns j (kept (1, K))
    x1t = x1.reshape(k, 1)
    y1t = y1.reshape(k, 1)
    x2t = x2.reshape(k, 1)
    y2t = y2.reshape(k, 1)
    at = area.reshape(k, 1)
    iw = jnp.maximum(jnp.minimum(x2t, x2) - jnp.maximum(x1t, x1), 0.0)
    ih = jnp.maximum(jnp.minimum(y2t, y2) - jnp.maximum(y1t, y1), 0.0)
    inter = iw * ih
    iou = inter / (at + area - inter + 1e-7)  # (K, K)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    adj = jnp.where((row_ids < col_ids) & (iou > thr_static), 1.0, 0.0)  # (K, K) f32
    iou_scratch[:] = adj

    valid = valid_ref[0, 0:1, :]  # (1, K) f32

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        received = jnp.dot(keep, iou_scratch[:], preferred_element_type=jnp.float32)  # (1, K)
        new_keep = valid * jnp.where(received > 0.0, 0.0, 1.0)
        return new_keep, keep, it + 1

    keep0 = valid
    prev0 = jnp.zeros_like(valid)
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, prev0, jnp.int32(0)))
    keep_ref[0, 0:1, :] = keep


@partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def pallas_greedy_keep(boxes, valid, iou_thres: float = 0.7, interpret: bool = False):
    """Batched greedy-NMS keep mask.

    Args:
        boxes: (B, K, 4) xyxy candidates sorted by descending score.
        valid: (B, K) bool/0-1 confidence-gate mask.

    Returns (B, K) bool keep mask identical to sequential greedy NMS.
    """
    b, k, _ = boxes.shape
    assert k % 128 == 0, f"K={k} must be lane-aligned (multiple of 128)"
    boxes_t = jnp.transpose(boxes.astype(jnp.float32), (0, 2, 1))  # (B, 4, K)
    valid_f = valid.astype(jnp.float32).reshape(b, 1, k)  # (B, 1, K): block dims == array dims

    kernel = partial(_nms_kernel, thr_static=float(iou_thres))
    keep = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        interpret=interpret,
    )(boxes_t, valid_f)
    return keep.reshape(b, k) > 0.5
