"""On-TPU non-maximum suppression with static shapes.

The reference leans on `torchvision.ops.nms` (a sequential CUDA kernel,
`ultralytics/utils/ops.py:181-331`). A greedy scan is hostile to TPUs, so this is a
re-design, not a port: exact greedy NMS computed as a *fixed-point iteration* of
dense vector/matrix ops.

Characterize greedy NMS (candidates sorted by score desc) as the unique solution of

    keep[j] = valid[j] and not exists i < j: keep[i] and iou[i, j] > thr

Jacobi-iterating this recurrence from keep = valid converges to that unique fixed
point in `max suppression-chain depth` steps (typically < 10), and every step is a
masked (K,) x (K,K) reduction the VPU eats for breakfast. Shapes are static: the
top `pre_topk` candidates by score enter, exactly `max_det` slots exit (padded),
so the whole thing jits once and runs entirely on device — no host sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from drone_yolo_tpu.ops.boxes import xywh2xyxy


def _iou_matrix(boxes, eps: float = 1e-7):
    """Pairwise IoU of xyxy boxes: (K, 4) -> (K, K)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    iw = jnp.clip(jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :]), 0, None)
    ih = jnp.clip(jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :]), 0, None)
    inter = iw * ih
    return inter / (area[:, None] + area[None, :] - inter + eps)


def _greedy_keep(suppress_adj, valid):
    """Exact greedy keep mask via fixed-point iteration.

    Args:
        suppress_adj: (K, K) bool, suppress_adj[i, j] = True if candidate i (higher
            score, i < j) would suppress j. Must be strictly upper-triangular.
        valid: (K,) bool, candidate passes the confidence gate.

    Returns:
        (K,) bool keep mask equal to sequential greedy NMS output.
    """
    k = valid.shape[0]
    adj = suppress_adj.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        # received[j] > 0 iff some currently-kept higher-scored box suppresses j
        received = keep.astype(jnp.float32) @ adj
        new_keep = valid & (received == 0.0)
        return new_keep, keep, it + 1

    init = (valid, jnp.zeros_like(valid), jnp.int32(0))
    keep, _, _ = jax.lax.while_loop(cond, body, init)
    return keep


def _use_pallas(k: int) -> bool:
    """Pallas kernel only on real TPUs with lane-aligned K small enough for
    the (K, K) f32 VMEM scratch (K=1024 -> 4 MB; K=4096 would need 64 MB and
    VMEM-OOMs — the XLA fixed-point fallback handles large K from HBM)."""
    try:
        import jax as _jax

        return _jax.default_backend() in ("tpu", "axon") and k % 128 == 0 and k <= 1024
    except Exception:  # noqa: BLE001
        return False


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "max_det", "pre_topk", "nc", "multi_label", "agnostic", "max_wh", "in_fmt",
    ),
)
def non_max_suppression(
    preds,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    pre_topk: int = 1024,
    nc: int = 0,
    multi_label: bool = False,
    agnostic: bool = False,
    classes=None,
    max_wh: int = 7680,
    in_fmt: str = "xywh",
):
    """Batched on-device NMS.

    Args:
        preds: (B, A, 4 + nc [+ extra]) decoded predictions; boxes in `in_fmt`,
            class scores already sigmoided (reference NMS input layout after
            `Detect._inference`, transposed to anchors-first).
        classes: optional (nc,) bool/0-1 mask of allowed classes (a *mask*, not an
            index list, to keep shapes static; build with `class_mask()`).

    Returns:
        dets: (B, max_det, 6 + extra) [x1, y1, x2, y2, conf, cls, extra...] zero-padded.
        n_valid: (B,) int32 count of real detections per image.
    """
    b, a, ch = preds.shape
    nc = nc or (ch - 4)
    n_extra = ch - 4 - nc

    boxes = preds[..., :4]
    scores = preds[..., 4 : 4 + nc]
    extra = preds[..., 4 + nc :]
    if in_fmt == "xywh":
        boxes = xywh2xyxy(boxes)

    if classes is not None:
        scores = scores * jnp.asarray(classes, dtype=scores.dtype)[None, None, :]

    k = min(pre_topk, a * nc if multi_label else a)
    pallas_ok = _use_pallas(k)

    # --- phase 1: per-image candidate selection (vmapped) -------------------
    def select(boxes_i, scores_i, extra_i):
        if multi_label:
            flat = scores_i.reshape(-1)  # (A*nc,)
            top_scores, top_idx = jax.lax.top_k(flat, k)
            anchor_idx = top_idx // nc
            cls_idx = (top_idx % nc).astype(jnp.float32)
        else:
            per_anchor = jnp.max(scores_i, axis=-1)
            cls_all = jnp.argmax(scores_i, axis=-1)
            top_scores, anchor_idx = jax.lax.top_k(per_anchor, k)
            cls_idx = cls_all[anchor_idx].astype(jnp.float32)
        cand_boxes = boxes_i[anchor_idx]  # (K, 4)
        cand_extra = extra_i[anchor_idx] if n_extra else jnp.zeros((k, 0), preds.dtype)
        valid = top_scores > conf_thres
        # Per-class offset trick (reference ops.py:306): boxes of different classes
        # never overlap after offsetting, so one dense NMS handles all classes.
        offset = jnp.zeros((k, 1), cand_boxes.dtype) if agnostic else (cls_idx[:, None] * max_wh).astype(cand_boxes.dtype)
        return cand_boxes, top_scores, cls_idx, cand_extra, valid, cand_boxes + offset

    cand_boxes, top_scores, cls_idx, cand_extra, valid, off_boxes = jax.vmap(select)(boxes, scores, extra)

    # --- phase 2: greedy suppression (pallas on TPU, XLA fixed-point else) ---
    if pallas_ok:
        from drone_yolo_tpu.ops.pallas_nms import pallas_greedy_keep

        keep = pallas_greedy_keep(off_boxes, valid, iou_thres)
    else:

        def suppress(off_i, valid_i):
            iou = _iou_matrix(off_i)
            upper = jnp.triu(jnp.ones((k, k), bool), 1)  # i < j in score order
            return _greedy_keep(upper & (iou > iou_thres), valid_i)

        keep = jax.vmap(suppress)(off_boxes, valid)

    # --- phase 3: compact kept candidates into max_det static slots ---------
    def compact(keep_i, cand_boxes_i, top_scores_i, cls_i, extra_i):
        order = jnp.argsort(jnp.logical_not(keep_i), stable=True)[:max_det]
        sel_valid = keep_i[order]
        det = jnp.concatenate(
            [cand_boxes_i[order], top_scores_i[order, None], cls_i[order, None], extra_i[order]], axis=-1
        )
        det = det * sel_valid[:, None].astype(det.dtype)
        return det, jnp.sum(sel_valid.astype(jnp.int32))

    dets, n_valid = jax.vmap(compact)(keep, cand_boxes, top_scores, cls_idx, cand_extra)
    return dets, n_valid


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_topk", "nc", "multi_label"))
def nms_rotated(preds, conf_thres: float = 0.25, iou_thres: float = 0.45, max_det: int = 300, pre_topk: int = 1024, nc: int = 0, multi_label: bool = False):
    """Batched rotated NMS using probiou (reference utils/ops.py:146 nms_rotated).

    Reference-exact semantics: FAST (matrix) suppression — a candidate is
    removed if ANY higher-scored same-class candidate overlaps it with
    probiou >= iou_thres, regardless of whether that candidate itself
    survives (`(ious.triu(1) >= threshold).sum(0) <= 0`, ops.py:168) — which
    prunes more than exact greedy NMS. With `multi_label` (validators), every
    (anchor, class) pair above conf enters as its own candidate
    (ops.py:286-288); otherwise best-class-only (predictors).

    preds: (B, A, 5 + nc) packed (cx, cy, w, h, scores..., angle).
    Returns (B, max_det, 7) [cx, cy, w, h, angle, conf, cls] and counts.
    """
    from drone_yolo_tpu.ops.boxes import probiou

    b, a, ch = preds.shape
    boxes = preds[..., :4]
    scores = preds[..., 4 : 4 + nc]
    angle = preds[..., 4 + nc : 5 + nc]
    k = min(pre_topk, a)
    arange = jnp.arange(k)

    def single(boxes_i, scores_i, angle_i):
        per_anchor = jnp.max(scores_i, axis=-1)
        _, idx = jax.lax.top_k(per_anchor, k)
        sc = scores_i[idx]  # (K, nc)
        rb = jnp.concatenate([boxes_i[idx], angle_i[idx]], axis=-1)  # (K, 5)
        iou = probiou(rb[:, None, :], rb[None, :, :])  # (K, K)

        def suppress(s, same_cls):
            """Fast-NMS survivors for per-candidate scores s (0 = invalid)."""
            valid = s > conf_thres
            higher = (s[:, None] > s[None, :]) | ((s[:, None] == s[None, :]) & (arange[:, None] < arange[None, :]))
            sup = jnp.any(higher & valid[:, None] & same_cls & (iou >= iou_thres), axis=0)
            return valid & ~sup

        if multi_label and nc > 1:
            # per-class candidate sets; cross-class pairs never interact
            # (reference offsets centers by cls*max_wh)
            keep = jax.lax.map(lambda c: suppress(sc[:, c], True), jnp.arange(nc)).T  # (K, nc)
            flat = jnp.where(keep, sc, 0.0).reshape(-1)  # (K*nc,)
            top_s, flat_idx = jax.lax.top_k(flat, min(max_det, flat.shape[0]))
            ai = flat_idx // nc
            ci = (flat_idx % nc).astype(jnp.float32)
            sel_valid = top_s > conf_thres
            det = jnp.concatenate([rb[ai], top_s[:, None], ci[:, None]], axis=-1)
        else:
            s = jnp.max(sc, axis=-1)
            cls_idx = jnp.argmax(sc, axis=-1).astype(jnp.float32)
            keep = suppress(s, cls_idx[:, None] == cls_idx[None, :])
            flat = jnp.where(keep, s, 0.0)
            top_s, ai = jax.lax.top_k(flat, min(max_det, flat.shape[0]))
            sel_valid = top_s > conf_thres
            det = jnp.concatenate([rb[ai], top_s[:, None], cls_idx[ai, None]], axis=-1)
        det = det * sel_valid[:, None].astype(det.dtype)
        return det, jnp.sum(sel_valid.astype(jnp.int32))

    return jax.vmap(single)(boxes, scores, angle)


def class_mask(classes, nc: int):
    """Build a static (nc,) 0/1 mask from a class index list (for `classes=` filtering)."""
    import numpy as np

    m = np.zeros(nc, dtype=np.float32)
    m[np.asarray(classes, dtype=int)] = 1.0
    return m
