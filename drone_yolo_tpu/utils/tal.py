"""Task-Aligned assigner as dense, static-shape JAX math.

Capability parity with `ultralytics/utils/tal.py:14-295` (TaskAlignedAssigner):
anchor<->GT assignment by metric score^alpha * CIoU^beta, top-k candidates inside
GT boxes, conflict resolution by max-IoU.

TPU re-design notes (SURVEY.md §7 "hard parts"):
* GT boxes are padded to a static `max_boxes` M; validity rides a mask. All the
  reference's boolean fancy-indexing becomes `where`-masked dense tensors of shape
  (B, M, A) — embarrassingly parallel on the VPU, no host sync, no CUDA-OOM CPU
  fallback needed (the reference's tal.py:73-80 escape hatch).
* The top-k mask is built by thresholding against the k-th largest metric per GT
  instead of scatter-from-indices: a (B, M, A) one-hot scatter would materialize
  B*M*k*A elements; the threshold trick is O(B*M*A) and matches greedy top-k
  exactly (kth_largest counts duplicate values, so ties at the boundary are
  admitted inclusively — torch.topk picks k of them arbitrarily; everything
  strictly above the k-th value matches bit-for-bit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from drone_yolo_tpu.ops.boxes import bbox_iou

# align-tensor materialization pin (see `assign`): above this size the pinned
# buffer risks the HBM roof (v5e: 15.75 GB usable; the b32 M=1024 A=34k dense
# e2e step OOM'd with it pinned) and remat is the right trade.
_BARRIER_MAX_BYTES = int(__import__("os").environ.get("DYT_TAL_BARRIER_MAX_BYTES", 2_500_000_000))


def _kth_largest_passes(x, k: int):
    """EXACT k-th largest value along the last axis, keepdims, WITHOUT a sort.

    lax.top_k lowers to a variadic sort of the whole (B, M, A) metric tensor on
    TPU (xprof showed the sort plus its S(1) staging copies dominating the train
    step). Up to k-1 rounds of "mask out the current max" + one final max is
    pure elementwise/reduce work the VPU streams at HBM speed.

    Duplicate values are counted exactly (reference torch.topk semantics): each
    round counts how many elements tie at the current max; once the cumulative
    masked count would reach k, that max IS the k-th largest and the row is
    done. Without this, a tie among top values would collapse in one round and
    return a value below the true k-th largest, admitting extra non-tied
    anchors into the candidate set (ADVICE r2).
    """
    shape = x.shape[:-1] + (1,)
    cur = x
    done = jnp.zeros(shape, bool)
    result = jnp.zeros(shape, x.dtype)
    cnt = jnp.zeros(shape, jnp.int32)
    for _ in range(k - 1):
        m = jnp.max(cur, axis=-1, keepdims=True)
        ties = jnp.sum((cur >= m).astype(jnp.int32), axis=-1, keepdims=True)
        overshoot = (cnt + ties >= k) & ~done
        result = jnp.where(overshoot, m, result)
        done = done | overshoot
        cur = jnp.where(~done & (cur >= m), -jnp.inf, cur)
        cnt = cnt + jnp.where(done, 0, ties)
    return jnp.where(done, result, jnp.max(cur, axis=-1, keepdims=True))


def kth_largest(x, k: int, block: int = 128):
    """EXACT k-th largest along the last axis, keepdims — blocked two-phase.

    For long rows (the flagship's A=34k anchors), the k-1 masking passes of
    `_kth_largest_passes` each stream the full (B, M, A) tensor through HBM
    (~9 full passes). Instead: (1) one pass computes per-block maxes, (2)
    lax.top_k picks the k best blocks per row (a tiny (B, M, A/block) sort),
    (3) a one-hot MXU contraction pulls those k blocks' elements (k*block per
    row, ~26x smaller), (4) the masking passes run on that candidate set.

    Exactness proof (duplicates counted, torch.topk semantics): at most k-1
    elements exceed the true k-th value v_k, so every chosen block's max is
    >= v_k and the chosen blocks jointly hold >= k elements >= v_k but at most
    k-1 elements > v_k — the k-th largest of the candidate set is exactly v_k.
    Padding uses the finite dtype minimum (NOT -inf: non-selected blocks are
    multiplied by 0 in the contraction and 0 * -inf would poison the sum with
    NaN) and never wins while the row has >= k real elements (A >= k). x must
    be finite (the align metric is in [0, 1]).
    """
    a = x.shape[-1]
    g = -(-a // block)
    if a <= 4 * k * block or k > block:  # short rows: passes are already cheap
        return _kth_largest_passes(x, k)
    pad_val = jnp.finfo(x.dtype).min
    xb = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, g * block - a)], constant_values=pad_val)
    xb = xb.reshape(*x.shape[:-1], g, block)
    bmax = jnp.max(xb, axis=-1)  # (..., G)
    # NOTE on layouts: top_k prefers a rows-in-lanes layout and XLA propagates
    # that preference upward; pinning bmax (or the blocked tensor) with
    # jax.experimental.layout.with_layout_constraint was measured STRICTLY
    # WORSE at the dense M=512 load — the pin re-introduced full relayout
    # copies of the 2.2 GB align tensor ({2,1,0}->{1,2,0} + a {3,2,1,0} copy)
    # and blew compile time past 10 min. Leave layout assignment alone here.
    _, bidx = jax.lax.top_k(bmax, k)  # (..., k) distinct block ids
    # Pull the k winning blocks' elements with a one-hot MXU contraction
    # (layout-agnostic; an HLO gather here re-introduces a relayout copy of
    # the full operand to its preferred layout).
    oh = jax.nn.one_hot(bidx, g, dtype=x.dtype)  # (..., k, G)
    cand = jnp.einsum("...kg,...gx->...kx", oh, xb, precision=jax.lax.Precision.HIGHEST)
    cand = cand.reshape(*x.shape[:-1], k * block)
    return _kth_largest_passes(cand, k)


def _fpow(x, p: float):
    """x**p for non-negative x with fast paths for the assigner's exponents.

    A float-exponent `pow` lowers to exp(p*log(x)) — two transcendentals per
    element of the (B, M, A) align tensor (xprof: the align fusion ran at
    ~2.5x its HBM-traffic roof at the dense M=512 load). alpha=0.5 / beta=6.0
    (the reference defaults, tal.py:60) become one rsqrt-class op / three
    multiplies; other exponents fall back to the generic pow."""
    if p == 0.5:
        return jnp.sqrt(x)
    if p == float(int(p)) and 1 <= int(p) <= 8:
        n, y, b = int(p), None, x
        while n:  # square-and-multiply
            if n & 1:
                y = b if y is None else y * b
            n >>= 1
            if n:
                b = b * b
        return y
    return x**p


def select_candidates_in_gts(xy_centers, gt_bboxes, eps: float = 1e-9):
    """(A, 2) anchor centers inside (B, M, 4) xyxy GT boxes -> (B, M, A) bool.

    Written as a min-of-4 chain (bit-identical to the reference's
    concat+amin, tal.py:153) instead of materializing (B, M, A, 2) lt/rb
    halves: the concat form made XLA write two full fp32 (B, M, A) tensors
    before the reduce (xprof: 2x subtract_reduce_fusion + a 7.8 ms consumer
    at the dense M=512 load); this form is one fused pass writing only the
    1-byte mask."""
    x, y = xy_centers[:, 0][None, None, :], xy_centers[:, 1][None, None, :]  # (1,1,A)
    x1, y1, x2, y2 = (gt_bboxes[..., i][..., None] for i in range(4))  # (B,M,1)
    d = jnp.minimum(jnp.minimum(x - x1, y - y1), jnp.minimum(x2 - x, y2 - y))
    return d > eps


def _ciou_gt_pd(gt, pd, eps: float = 1e-7):
    """CIoU of (B, M, 4) GT boxes vs (B, A, 4) predicted boxes -> (B, M, A).

    Same math as `bbox_iou(gt[:, :, None], pd[:, None], xywh=False, CIoU=True)`
    (reference metrics.py:74) with the arctan aspect terms HOISTED to their
    natural (B, M) / (B, A) extents behind an optimization_barrier: inlined
    into the fused (B, M, A) loop XLA re-evaluates the transcendental per
    GT-anchor pair (557M arctans at the dense M=512 load) instead of M+A
    times."""
    gx1, gy1, gx2, gy2 = (gt[..., i] for i in range(4))  # (B, M)
    px1, py1, px2, py2 = (pd[..., i] for i in range(4))  # (B, A)
    w1, hy1 = gx2 - gx1, gy2 - gy1
    w2, hy2 = px2 - px1, py2 - py1
    at_gt = jax.lax.optimization_barrier(jnp.arctan(w1 / (hy1 + 2 * eps)))  # (B, M)
    at_pd = jax.lax.optimization_barrier(jnp.arctan(w2 / (hy2 + 2 * eps)))  # (B, A)
    area1 = jax.lax.optimization_barrier(w1 * hy1)
    area2 = jax.lax.optimization_barrier(w2 * hy2)

    def G(t):  # broadcast a (B, M) gt term
        return t[:, :, None]

    def P(t):  # broadcast a (B, A) pd term
        return t[:, None, :]

    inter = jnp.clip(jnp.minimum(G(gx2), P(px2)) - jnp.maximum(G(gx1), P(px1)), 0, None) * jnp.clip(
        jnp.minimum(G(gy2), P(py2)) - jnp.maximum(G(gy1), P(py1)), 0, None
    )
    union = G(area1) + P(area2) - inter + eps
    iou = inter / union
    cw = jnp.maximum(G(gx2), P(px2)) - jnp.minimum(G(gx1), P(px1))
    ch = jnp.maximum(G(gy2), P(py2)) - jnp.minimum(G(gy1), P(py1))
    c2 = cw**2 + ch**2 + eps
    rho2 = ((P(px1) + P(px2) - G(gx1) - G(gx2)) ** 2 + (P(py1) + P(py2) - G(gy1) - G(gy2)) ** 2) / 4
    v = (4 / jnp.pi**2) * (P(at_pd) - G(at_gt)) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta"))
def assign(
    pd_scores,  # (B, A, nc) sigmoid class scores
    pd_bboxes,  # (B, A, 4) xyxy, same units as gt_bboxes
    anc_points,  # (A, 2), same units as gt_bboxes
    gt_labels,  # (B, M) int32 class ids (padded)
    gt_bboxes,  # (B, M, 4) xyxy (padded)
    mask_gt,  # (B, M) bool/0-1 validity of each padded GT slot
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns (target_labels (B,A), target_bboxes (B,A,4), target_scores (B,A,nc),
    fg_mask (B,A) bool, target_gt_idx (B,A))."""
    b, a, nc = pd_scores.shape
    m = gt_bboxes.shape[1]
    mask_gt = mask_gt.astype(bool).reshape(b, m)

    # Pad the anchor axis to a multiple of the kth_largest block so the
    # blocked top-k reshape is pad-free (a trailing jnp.pad of the fp32
    # (B, M, A) align tensor cost 6.8 ms at the dense M=512 load). Padded
    # anchors sit at -1e6 (outside every GT -> align exactly 0, which can
    # never displace the k-th largest of a non-negative metric) and padded
    # pred boxes are degenerate-but-finite so CIoU stays NaN-free.
    a_pad = (-a) % 128 if a > 4 * topk * 128 else 0
    if a_pad:
        anc_points = jnp.pad(anc_points, ((0, a_pad), (0, 0)), constant_values=-1e6)
        pd_scores = jnp.pad(pd_scores, ((0, 0), (0, a_pad), (0, 0)))
        pd_bboxes = jnp.concatenate(
            [pd_bboxes, jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 1.0], pd_bboxes.dtype), (b, a_pad, 1))], axis=1
        )

    # ---- alignment metric over all (gt, anchor) pairs ----------------------
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # (B, M, A)
    # class score of each anchor at each GT's class. One-hot CONTRACTION, not
    # take_along_axis: at the flagship's A=34k a (B,*,A)-indexed HLO gather is
    # serial-DMA bound on TPU (~21 ms/step measured); the one-hot matmul rides
    # the MXU and is bit-exact at HIGHEST precision (single nonzero term, 1.0
    # is exact in every bf16 pass of the f32 decomposition).
    gl = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)  # (B, M)
    oh_cls = jax.nn.one_hot(gl, nc, dtype=pd_scores.dtype)  # (B, M, nc)
    bov = jnp.einsum("bmc,bac->bma", oh_cls, pd_scores, precision=jax.lax.Precision.HIGHEST)
    overlaps = jnp.clip(_ciou_gt_pd(gt_bboxes, pd_bboxes), 0, None)  # (B, M, A)
    valid = mask_in_gts & mask_gt[:, :, None]
    align = jnp.where(valid, _fpow(bov, alpha) * _fpow(overlaps, beta), 0.0)
    # Force ONE materialization: without the barrier XLA's HBM rematerializer
    # recomputes this 2.2 GB fusion in full for the late consumers (xprof:
    # fusion.4 + fusion.4.remat, 2x 13.9 ms/step at the dense M=512 load).
    # (Materializing `overlaps` alongside was measured NET NEGATIVE: the extra
    # production pass + relayout copy cost more than the consumers' inline
    # CIoU recompute saves.) Size-guarded: at the e2e dense load (M=1024 was
    # 4.25 GB) pinning the buffer pushed the step past the 15.75 GB HBM roof —
    # beyond the cap XLA's rematerializer is the memory-correct choice.
    if align.size * 4 <= _BARRIER_MAX_BYTES:
        align = jax.lax.optimization_barrier(align)

    # ---- top-k candidates per GT (threshold against k-th largest) ----------
    kth = kth_largest(align, topk)  # (B, M, 1)
    mask_topk = (align >= jnp.maximum(kth, eps)) & (align > eps)
    mask_pos = mask_topk & valid  # (B, M, A)

    # ---- conflict resolution: anchor claimed by several GTs -> max overlap --
    fg_mask = jnp.any(mask_pos, axis=1)  # (B, A)
    ov_masked = jnp.where(mask_pos, overlaps, -1.0)
    target_gt_idx = jnp.argmax(ov_masked, axis=1)  # (B, A)
    # rebuild the deduplicated positive mask for metric normalization. bf16:
    # one-hot values are exact in every dtype, and at the dense load the fp32
    # (B, M, A) one-hot was a 2.8-4.5 GB buffer read by two einsums — bf16
    # halves its HBM footprint and traffic with zero numeric change (mixed
    # bf16x f32 einsums promote to f32; the single nonzero term is 1.0).
    onehot_gt = jax.nn.one_hot(target_gt_idx, m, axis=1, dtype=jnp.bfloat16)  # (B, M, A)
    mask_pos = (onehot_gt > 0) & fg_mask[:, None, :] & mask_pos

    # ---- targets (ONE one-hot contraction over M — same MXU trick as bov;
    # labels ride as a 5th "coordinate" so the big one-hot is read once) -----
    gt_cat = jnp.concatenate([gt_bboxes, gl.astype(jnp.float32)[..., None]], axis=-1)  # (B, M, 5)
    tgt = jnp.einsum("bma,bmc->bac", onehot_gt, gt_cat, precision=jax.lax.Precision.HIGHEST)
    target_bboxes = tgt[..., :4]  # (B, A, 4)
    target_labels = tgt[..., 4].astype(jnp.int32)  # (B, A)

    # normalized alignment scores (reference tal.py:118-127)
    align_pos = jnp.where(mask_pos, align, 0.0)
    pos_align_max = jnp.max(align_pos, axis=-1, keepdims=True)  # (B, M, 1)
    pos_overlap_max = jnp.max(jnp.where(mask_pos, overlaps, 0.0), axis=-1, keepdims=True)
    norm_align = align_pos * pos_overlap_max / (pos_align_max + eps)  # (B, M, A)
    norm_metric = jnp.max(norm_align, axis=1)  # (B, A)

    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = target_scores * (fg_mask[..., None] * norm_metric[..., None])
    if a_pad:  # drop the padded anchor slots (their fg_mask is provably False)
        target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx = (
            t[:, :a] for t in (target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)
        )
    return target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx


class TaskAlignedAssigner:
    """Thin object wrapper matching the reference class shape (tal.py:14)."""

    def __init__(self, topk=10, num_classes=80, alpha=0.5, beta=6.0, eps=1e-9):
        self.topk, self.num_classes = topk, num_classes
        self.alpha, self.beta, self.eps = alpha, beta, eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        return assign(
            pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt,
            topk=self.topk, num_classes=self.num_classes, alpha=self.alpha, beta=self.beta,
            eps=self.eps,
        )


def select_candidates_in_rotated_gts(xy_centers, gt_rboxes, eps: float = 1e-9):
    """(A, 2) anchor centers inside (B, M, 5) rotated GT boxes -> (B, M, A) bool.

    Reference: tal.py:298 RotatedTaskAlignedAssigner.select_candidates_in_gts —
    point-in-rotated-rect via projections onto the box axes.
    """
    cx, cy, w, h, r = (gt_rboxes[..., i] for i in range(5))
    cos, sin = jnp.cos(r), jnp.sin(r)
    dx = xy_centers[None, None, :, 0] - cx[..., None]  # (B, M, A)
    dy = xy_centers[None, None, :, 1] - cy[..., None]
    # rotate the offset into the box frame
    u = dx * cos[..., None] + dy * sin[..., None]
    v = -dx * sin[..., None] + dy * cos[..., None]
    return (jnp.abs(u) < w[..., None] / 2 - eps) & (jnp.abs(v) < h[..., None] / 2 - eps)


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta"))
def assign_rotated(
    pd_scores, pd_rboxes, anc_points, gt_labels, gt_rboxes, mask_gt,
    topk: int = 10, num_classes: int = 80, alpha: float = 0.5, beta: float = 6.0, eps: float = 1e-9,
):
    """Rotated-box task-aligned assignment (probiou metric).

    Same contract as `assign` but boxes are (cx, cy, w, h, angle)."""
    from drone_yolo_tpu.ops.boxes import probiou

    b, a, nc = pd_scores.shape
    m = gt_rboxes.shape[1]
    mask_gt = mask_gt.astype(bool).reshape(b, m)

    mask_in_gts = select_candidates_in_rotated_gts(anc_points, gt_rboxes)
    gl = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)
    # one-hot contraction instead of take_along_axis (see `assign`)
    oh_cls = jax.nn.one_hot(gl, nc, dtype=pd_scores.dtype)
    bov = jnp.einsum("bmc,bac->bma", oh_cls, pd_scores, precision=jax.lax.Precision.HIGHEST)
    overlaps = jnp.clip(probiou(gt_rboxes[:, :, None, :], pd_rboxes[:, None, :, :]), 0, None)
    valid = mask_in_gts & mask_gt[:, :, None]
    align = jnp.where(valid, _fpow(bov, alpha) * _fpow(overlaps, beta), 0.0)

    kth = kth_largest(align, topk)
    mask_topk = (align >= jnp.maximum(kth, eps)) & (align > eps)
    mask_pos = mask_topk & valid

    fg_mask = jnp.any(mask_pos, axis=1)
    ov_masked = jnp.where(mask_pos, overlaps, -1.0)
    target_gt_idx = jnp.argmax(ov_masked, axis=1)
    onehot_gt = jax.nn.one_hot(target_gt_idx, m, axis=1, dtype=align.dtype)
    mask_pos = (onehot_gt > 0) & fg_mask[:, None, :] & mask_pos

    target_labels = jnp.einsum(
        "bma,bm->ba", onehot_gt, gl.astype(onehot_gt.dtype), precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)
    target_rboxes = jnp.einsum(
        "bma,bmc->bac", onehot_gt, gt_rboxes, precision=jax.lax.Precision.HIGHEST
    )

    align_pos = jnp.where(mask_pos, align, 0.0)
    pos_align_max = jnp.max(align_pos, axis=-1, keepdims=True)
    pos_overlap_max = jnp.max(jnp.where(mask_pos, overlaps, 0.0), axis=-1, keepdims=True)
    norm_align = align_pos * pos_overlap_max / (pos_align_max + eps)
    norm_metric = jnp.max(norm_align, axis=1)

    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = target_scores * (fg_mask[..., None] * norm_metric[..., None])
    return target_labels, target_rboxes, target_scores, fg_mask, target_gt_idx


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """Rotated variant (reference tal.py:298)."""

    def __call__(self, pd_scores, pd_rboxes, anc_points, gt_labels, gt_rboxes, mask_gt):
        return assign_rotated(
            pd_scores, pd_rboxes, anc_points, gt_labels, gt_rboxes, mask_gt,
            topk=self.topk, num_classes=self.num_classes, alpha=self.alpha, beta=self.beta,
        )
