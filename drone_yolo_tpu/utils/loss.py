"""Task losses as pure jitted JAX: v8 detection (BCE + CIoU + DFL on TAL targets).

Capability parity with `ultralytics/utils/loss.py:65-260` (BboxLoss, DFLoss,
v8DetectionLoss). Targets arrive PADDED to a static max_boxes with a validity
mask (built host-side by the data pipeline) — no ragged tensors ever reach the
device, so the whole loss jits into one fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drone_yolo_tpu.ops.anchors import bbox2dist, dist2bbox, make_anchors
from drone_yolo_tpu.ops.boxes import bbox_iou
from drone_yolo_tpu.utils.tal import TaskAlignedAssigner


def bce_with_logits(logits, labels):
    """Elementwise binary cross-entropy on logits (reference: BCEWithLogitsLoss)."""
    # log(1+exp(-|x|)) formulation for stability
    neg_abs = -jnp.abs(logits)
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(neg_abs))


def df_loss(pred_dist, target, reg_max: int = 16):
    """Distribution Focal Loss (reference loss.py:83 DFLoss.__call__).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous distances in
    [0, reg_max-1). Two-sided cross-entropy against the bracketing integer bins.

    TPU note: expressed gather-free — the two bracketing-bin cross-entropies
    collapse to `logsumexp - <two_hot_weights, logits>`, a fused elementwise
    reduction over the 16 bins. The take_along_axis form materializes s32 index
    tensors of the full (B, A, 4) extent and showed up as ~8% of the whole
    train step in the xprof breakdown (tools/xprof_breakdown.py).
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target)
    wl = tl + 1.0 - target  # weight of the left bin
    wr = 1.0 - wl
    # wl*CE(tl) + wr*CE(tr) = logsumexp(logits) - (wl*logit[tl] + wr*logit[tr])
    bins = jnp.arange(reg_max, dtype=target.dtype)
    two_hot = wl[..., None] * (bins == tl[..., None]) + wr[..., None] * (bins == tl[..., None] + 1.0)
    lse = jax.nn.logsumexp(pred_dist, axis=-1)
    picked = jnp.sum(two_hot * pred_dist, axis=-1)
    return jnp.mean(lse - picked, axis=-1, keepdims=True)  # mean over the 4 sides


def varifocal_loss(pred_score, gt_score, label, alpha: float = 0.75, gamma: float = 2.0):
    """Varifocal loss (reference loss.py:16 VarifocalLoss, Zhang et al. 2008.13367).

    IoU-aware classification loss: positives weighted by the soft gt_score,
    negatives down-weighted by alpha * p^gamma. Reduction matches the
    reference exactly: elementwise BCE * weight, mean over axis 1, summed.
    """
    pred_score = pred_score.astype(jnp.float32)
    gt_score = gt_score.astype(jnp.float32)
    label = label.astype(jnp.float32)
    weight = alpha * jax.nn.sigmoid(pred_score) ** gamma * (1.0 - label) + gt_score * label
    return (bce_with_logits(pred_score, gt_score) * weight).mean(axis=1).sum()


def focal_loss(pred, label, gamma: float = 1.5, alpha: float = 0.25):
    """Focal loss on logits (reference loss.py:40 FocalLoss, TF-addons form).

    BCE modulated by (1 - p_t)^gamma and the alpha class-balance factor;
    mean over axis 1, summed (reference reduction).
    """
    pred = pred.astype(jnp.float32)
    label = label.astype(jnp.float32)
    loss = bce_with_logits(pred, label)
    pred_prob = jax.nn.sigmoid(pred)
    p_t = label * pred_prob + (1.0 - label) * (1.0 - pred_prob)
    loss = loss * (1.0 - p_t) ** gamma
    if alpha > 0:
        loss = loss * (label * alpha + (1.0 - label) * (1.0 - alpha))
    return loss.mean(axis=1).sum()


class v8DetectionLoss:
    """Detection criterion (reference loss.py:157 v8DetectionLoss).

    Call with per-level raw maps (train output of Detect) and a padded target
    dict {"cls": (B, M), "bboxes": (B, M, 4) xyxy pixels, "mask": (B, M)}.
    Returns (total_loss_scalar, items[3] = detached box/cls/dfl components).
    """

    def __init__(self, model, tal_topk: int = 10, box: float = 7.5, cls: float = 0.5, dfl: float = 1.5):
        head = model.head
        self.nc = head.nc
        self.reg_max = head.reg_max
        self.no = head.no
        self.strides = list(head.stride)
        self.gains = dict(box=box, cls=cls, dfl=dfl)
        self.assigner = TaskAlignedAssigner(topk=tal_topk, num_classes=self.nc, alpha=0.5, beta=6.0)

    def __call__(self, feats, targets):
        b = feats[0].shape[0]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)
        anchor_points = jnp.asarray(anchor_points)  # (A, 2) grid units
        stride_tensor = jnp.asarray(stride_tensor)  # (A, 1)

        # keep the (B, A, no) head tensor in the compute dtype (bf16 in training,
        # like the reference under AMP) and fuse the fp32 upcast into each
        # consumer: materializing it fp32 costs ~3 extra 300 MB passes/step at
        # 34k anchors (xprof: add_add_fusion f32[32,34000,64], ROUND3.md)
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        pred_distri, pred_scores = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]

        # decode boxes in grid units (reference bbox_decode, loss.py:197)
        a = pred_distri.shape[1]
        dist = jax.nn.softmax(pred_distri.reshape(b, a, 4, self.reg_max).astype(jnp.float32), axis=-1) @ jnp.arange(
            self.reg_max, dtype=jnp.float32
        )
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # (B, A, 4) xyxy grid units

        gt_labels = targets["cls"].astype(jnp.int32)  # (B, M)
        gt_bboxes = targets["bboxes"].astype(jnp.float32)  # (B, M, 4) xyxy pixels
        mask_gt = targets["mask"].astype(jnp.float32)  # (B, M)
        # zero out padded slots so degenerate boxes can't catch anchors
        gt_bboxes = gt_bboxes * mask_gt[..., None]

        _, target_bboxes, target_scores, fg_mask, _ = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(jnp.float32))),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )
        target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

        # cls: BCE over all anchors/classes (reference loss.py:225)
        loss_cls = jnp.sum(bce_with_logits(pred_scores.astype(jnp.float32), target_scores)) / target_scores_sum

        # box + dfl on foreground anchors (reference BboxLoss, loss.py:65)
        target_bboxes = target_bboxes / stride_tensor[None]
        weight = jnp.sum(target_scores, axis=-1) * fg_mask  # (B, A)
        iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)  # (B, A)
        loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], target_bboxes, self.reg_max - 1)  # (B, A, 4)
        dfl_elem = df_loss(pred_distri.reshape(b, a, 4, self.reg_max).astype(jnp.float32), target_ltrb, self.reg_max)[
            ..., 0
        ]
        loss_dfl = jnp.sum(dfl_elem * weight) / target_scores_sum

        items = jnp.stack(
            [loss_box * self.gains["box"], loss_cls * self.gains["cls"], loss_dfl * self.gains["dfl"]]
        )
        # reference returns loss.sum() * batch_size (loss.py:260)
        return jnp.sum(items) * b, jax.lax.stop_gradient(items)

    def _detect_parts(self, feats, targets):
        """Shared detection-loss computation returning intermediates for subclasses."""
        b = feats[0].shape[0]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)
        anchor_points = jnp.asarray(anchor_points)
        stride_tensor = jnp.asarray(stride_tensor)
        # bf16-materialized head tensor, fp32 fused into consumers (see __call__)
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        pred_distri, pred_scores = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        a = pred_distri.shape[1]
        dist = jax.nn.softmax(pred_distri.reshape(b, a, 4, self.reg_max).astype(jnp.float32), axis=-1) @ jnp.arange(
            self.reg_max, dtype=jnp.float32
        )
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)

        gt_labels = targets["cls"].astype(jnp.int32)
        gt_bboxes = targets["bboxes"].astype(jnp.float32) * targets["mask"].astype(jnp.float32)[..., None]
        mask_gt = targets["mask"].astype(jnp.float32)
        t_labels, t_bboxes, t_scores, fg_mask, t_gt_idx = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(jnp.float32))),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )
        tss = jnp.maximum(jnp.sum(t_scores), 1.0)
        loss_cls = jnp.sum(bce_with_logits(pred_scores.astype(jnp.float32), t_scores)) / tss
        t_bboxes_g = t_bboxes / stride_tensor[None]
        weight = jnp.sum(t_scores, axis=-1) * fg_mask
        iou = bbox_iou(pred_bboxes, t_bboxes_g, xywh=False, CIoU=True)
        loss_box = jnp.sum((1.0 - iou) * weight) / tss
        t_ltrb = bbox2dist(anchor_points[None], t_bboxes_g, self.reg_max - 1)
        dfl_elem = df_loss(pred_distri.reshape(b, a, 4, self.reg_max).astype(jnp.float32), t_ltrb, self.reg_max)[..., 0]
        loss_dfl = jnp.sum(dfl_elem * weight) / tss
        return {
            "b": b,
            "anchor_points": anchor_points,
            "stride_tensor": stride_tensor,
            "pred_bboxes": pred_bboxes,
            "fg_mask": fg_mask,
            "t_gt_idx": t_gt_idx,
            "t_bboxes": t_bboxes,
            "t_scores": t_scores,
            "tss": tss,
            "loss_box": loss_box,
            "loss_cls": loss_cls,
            "loss_dfl": loss_dfl,
            "weight": weight,
        }


class v8SegmentationLoss(v8DetectionLoss):
    """Detection losses + prototype-mask BCE (reference loss.py:263).

    Static-shape twist: the reference iterates over the dynamic set of foreground
    anchors; here the top `max_fg` anchors by assigned score are selected per
    image (fg beyond that cap — rare at sane max_boxes — is dropped from the
    MASK loss only; box/cls/dfl still see every anchor).
    """

    def __init__(self, model, overlap: bool = True, max_fg: int = 128, **kw):
        super().__init__(model, **kw)
        self.overlap = overlap
        self.max_fg = max_fg
        self.nm = model.head.nm

    def __call__(self, outs, targets):
        feats, coeffs, protos = outs  # (B,A,nm), (B,hm,wm,nm)
        p = self._detect_parts(feats, targets)
        b = p["b"]
        hm, wm = protos.shape[1:3]
        imgsz_h = feats[0].shape[1] * int(self.strides[0])
        imgsz_w = feats[0].shape[2] * int(self.strides[0])

        # top-K fg anchors per image by assigned score
        k = min(self.max_fg, p["fg_mask"].shape[1])
        score = p["weight"]  # (B, A)
        top_scores, top_idx = jax.lax.top_k(score, k)  # (B, K)
        sel_valid = top_scores > 0
        sel_coeffs = jnp.take_along_axis(coeffs.astype(jnp.float32), top_idx[..., None], axis=1)  # (B,K,nm)
        sel_gt_idx = jnp.take_along_axis(p["t_gt_idx"], top_idx, axis=1)  # (B,K)
        sel_boxes = jnp.take_along_axis(p["t_bboxes"], top_idx[..., None], axis=1)  # (B,K,4) pixels

        # predicted mask logits (B,K,hm,wm)
        pm = jnp.einsum("bkn,bhwn->bkhw", sel_coeffs, protos.astype(jnp.float32))
        # GT masks from the overlap index mask: pixel == gt_idx + 1
        om = targets["masks"].astype(jnp.int32)  # (B, hm', wm') — mask_ratio-downsampled
        if om.shape[1:] != (hm, wm):
            om_f = jax.image.resize(om.astype(jnp.float32), (b, hm, wm), method="nearest")
            om = om_f.astype(jnp.int32)
        gt_m = (om[:, None, :, :] == (sel_gt_idx[:, :, None, None] + 1)).astype(jnp.float32)

        bce = bce_with_logits(pm, gt_m)  # (B,K,hm,wm)
        from drone_yolo_tpu.ops.masks import crop_mask

        scale = jnp.asarray([wm / imgsz_w, hm / imgsz_h, wm / imgsz_w, hm / imgsz_h], jnp.float32)
        mboxes = sel_boxes * scale
        bce = jax.vmap(crop_mask)(bce, mboxes)
        # normalize per anchor by box area in mask space (reference single_mask_loss)
        area = jnp.maximum((mboxes[..., 2] - mboxes[..., 0]) * (mboxes[..., 3] - mboxes[..., 1]), 1.0)
        per_anchor = jnp.sum(bce, axis=(2, 3)) / area  # (B,K)
        n_fg = jnp.maximum(jnp.sum(sel_valid.astype(jnp.float32)), 1.0)
        loss_seg = jnp.sum(per_anchor * sel_valid) / n_fg

        items = jnp.stack(
            [
                p["loss_box"] * self.gains["box"],
                loss_seg * self.gains["box"],
                p["loss_cls"] * self.gains["cls"],
                p["loss_dfl"] * self.gains["dfl"],
            ]
        )
        return jnp.sum(items) * b, jax.lax.stop_gradient(items)


# COCO-17 keypoint sigmas (reference loss.py OKS_SIGMA)
OKS_SIGMA = (
    jnp.asarray([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


class v8PoseLoss(v8DetectionLoss):
    """Detection losses + OKS-like keypoint location loss + visibility BCE
    (reference loss.py v8PoseLoss + KeypointLoss:140)."""

    def __init__(self, model, pose_gain: float = 12.0, kobj_gain: float = 1.0, max_fg: int = 128, **kw):
        super().__init__(model, **kw)
        self.kpt_shape = model.head.kpt_shape
        self.pose_gain = pose_gain
        self.kobj_gain = kobj_gain
        self.max_fg = max_fg
        nk = self.kpt_shape[0]
        self.sigmas = OKS_SIGMA if nk == 17 else jnp.ones(nk) / nk

    def __call__(self, outs, targets):
        feats, pred_kpts_raw = outs  # (B, A, nk*nd)
        p = self._detect_parts(feats, targets)
        b = p["b"]
        nk, nd = self.kpt_shape
        a = pred_kpts_raw.shape[1]
        anchor_points = p["anchor_points"]
        stride_tensor = p["stride_tensor"]

        kr = pred_kpts_raw.astype(jnp.float32).reshape(b, a, nk, nd)
        # decode to pixel space (reference kpts_decode: 2*pred + anchor - 0.5, x stride)
        kxy = (kr[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)) * stride_tensor[None, :, None, :]

        k = min(self.max_fg, a)
        score = p["weight"]
        top_scores, top_idx = jax.lax.top_k(score, k)
        sel_valid = (top_scores > 0).astype(jnp.float32)
        sel_w = jnp.take_along_axis(score, top_idx, axis=1) * sel_valid
        sel_kxy = jnp.take_along_axis(kxy, top_idx[:, :, None, None], axis=1)  # (B,K,nk,2)
        sel_kconf = (
            jnp.take_along_axis(kr[..., 2], top_idx[:, :, None], axis=1) if nd == 3 else None
        )
        sel_gt_idx = jnp.take_along_axis(p["t_gt_idx"], top_idx, axis=1)
        sel_boxes = jnp.take_along_axis(p["t_bboxes"], top_idx[..., None], axis=1)  # pixels

        gt_kpts = targets["keypoints"].astype(jnp.float32)  # (B, M, nk, 3) pixel + vis
        sel_gt_kpts = jnp.take_along_axis(gt_kpts, sel_gt_idx[:, :, None, None], axis=1)  # (B,K,nk,3)

        kpt_mask = (sel_gt_kpts[..., 2] > 0).astype(jnp.float32)  # (B,K,nk)
        area = jnp.maximum(
            (sel_boxes[..., 2] - sel_boxes[..., 0]) * (sel_boxes[..., 3] - sel_boxes[..., 1]), 1e-9
        )[..., None]
        d2 = jnp.sum((sel_kxy - sel_gt_kpts[..., :2]) ** 2, axis=-1)  # (B,K,nk)
        kpt_loss_factor = nk / jnp.maximum(jnp.sum(kpt_mask, axis=-1, keepdims=True), 1.0)
        e = d2 / ((2 * self.sigmas[None, None, :]) ** 2) / (area * 2) / 2
        oks_loss = kpt_loss_factor * (1.0 - jnp.exp(-e)) * kpt_mask  # (B,K,nk)
        n_fg = jnp.maximum(jnp.sum(sel_valid), 1.0)
        loss_kpt = jnp.sum(jnp.mean(oks_loss, axis=-1) * sel_valid) / n_fg

        if sel_kconf is not None:
            kobj = bce_with_logits(sel_kconf, kpt_mask)
            loss_kobj = jnp.sum(jnp.mean(kobj, axis=-1) * sel_valid) / n_fg
        else:
            loss_kobj = jnp.zeros(())

        items = jnp.stack(
            [
                p["loss_box"] * self.gains["box"],
                loss_kpt * self.pose_gain,
                loss_kobj * self.kobj_gain,
                p["loss_cls"] * self.gains["cls"],
                p["loss_dfl"] * self.gains["dfl"],
            ]
        )
        return jnp.sum(items) * b, jax.lax.stop_gradient(items)


class v8OBBLoss(v8DetectionLoss):
    """Oriented-box loss: probiou + DFL on rotated targets (reference loss.py v8OBBLoss)."""

    def __init__(self, model, **kw):
        super().__init__(model, **kw)
        from drone_yolo_tpu.utils.tal import RotatedTaskAlignedAssigner

        self.assigner = RotatedTaskAlignedAssigner(topk=10, num_classes=self.nc, alpha=0.5, beta=6.0)

    def __call__(self, outs, targets):
        from drone_yolo_tpu.ops.anchors import dist2rbox
        from drone_yolo_tpu.ops.boxes import probiou

        feats, pred_angle = outs  # angle (B, A, 1) already in radians
        b = feats[0].shape[0]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)
        anchor_points = jnp.asarray(anchor_points)
        stride_tensor = jnp.asarray(stride_tensor)
        # bf16-materialized head tensor, fp32 fused into consumers (see __call__)
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        pred_distri, pred_scores = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        a = pred_distri.shape[1]
        dist = jax.nn.softmax(pred_distri.reshape(b, a, 4, self.reg_max).astype(jnp.float32), axis=-1) @ jnp.arange(
            self.reg_max, dtype=jnp.float32
        )
        pred_rboxes = dist2rbox(dist, pred_angle.astype(jnp.float32), anchor_points[None])  # grid units

        gt_labels = targets["cls"].astype(jnp.int32)
        gt_rboxes = targets["rboxes"].astype(jnp.float32) * targets["mask"].astype(jnp.float32)[..., None]
        mask_gt = targets["mask"].astype(jnp.float32)
        pred_rboxes_px = jnp.concatenate(
            [pred_rboxes[..., :4] * stride_tensor[None], pred_rboxes[..., 4:]], axis=-1
        )
        _, t_rboxes, t_scores, fg_mask, _ = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(jnp.float32))),
            jax.lax.stop_gradient(pred_rboxes_px),
            anchor_points * stride_tensor,
            gt_labels,
            gt_rboxes,
            mask_gt,
        )
        tss = jnp.maximum(jnp.sum(t_scores), 1.0)
        loss_cls = jnp.sum(bce_with_logits(pred_scores.astype(jnp.float32), t_scores)) / tss

        t_rboxes_g = jnp.concatenate([t_rboxes[..., :4] / stride_tensor[None], t_rboxes[..., 4:]], axis=-1)
        weight = jnp.sum(t_scores, axis=-1) * fg_mask
        iou = probiou(pred_rboxes, t_rboxes_g)
        loss_box = jnp.sum((1.0 - iou) * weight) / tss

        # DFL on the axis-aligned extent of the rotated target (reference
        # RotatedBboxLoss: bbox2dist over xywh2xyxy of the rbox)
        cxcy, wh = t_rboxes_g[..., :2], t_rboxes_g[..., 2:4]
        t_xyxy = jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)
        t_ltrb = bbox2dist(anchor_points[None], t_xyxy, self.reg_max - 1)
        dfl_elem = df_loss(pred_distri.reshape(b, a, 4, self.reg_max).astype(jnp.float32), t_ltrb, self.reg_max)[..., 0]
        loss_dfl = jnp.sum(dfl_elem * weight) / tss

        items = jnp.stack(
            [loss_box * self.gains["box"], loss_cls * self.gains["cls"], loss_dfl * self.gains["dfl"]]
        )
        return jnp.sum(items) * b, jax.lax.stop_gradient(items)


class E2EDetectLoss:
    """Dual-assignment loss for NMS-free v10 heads (reference loss.py E2EDetectLoss):
    one2many auxiliary branch (top-10 TAL) + one2one deployed branch (top-1)."""

    def __init__(self, model, box: float = 7.5, cls: float = 0.5, dfl: float = 1.5):
        self.one2many = v8DetectionLoss(model, tal_topk=10, box=box, cls=cls, dfl=dfl)
        self.one2one = v8DetectionLoss(model, tal_topk=1, box=box, cls=cls, dfl=dfl)

    def __call__(self, outs, targets):
        l_many, i_many = self.one2many(outs["one2many"], targets)
        l_one, i_one = self.one2one(outs["one2one"], targets)
        return l_many + l_one, i_many + i_one


class v8ClassificationLoss:
    """Cross-entropy classification loss (reference loss.py v8ClassificationLoss)."""

    def __call__(self, preds, targets):
        logits = preds.astype(jnp.float32)
        labels = targets["cls"].astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        loss = jnp.mean(nll)
        return loss, jax.lax.stop_gradient(loss[None])
