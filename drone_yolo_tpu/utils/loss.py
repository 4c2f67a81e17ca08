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
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], axis=-1)[..., 0]
    return jnp.mean(ce_l * wl + ce_r * wr, axis=-1, keepdims=True)  # mean over the 4 sides


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

        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1).astype(jnp.float32)
        pred_distri, pred_scores = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]

        # decode boxes in grid units (reference bbox_decode, loss.py:197)
        a = pred_distri.shape[1]
        dist = jax.nn.softmax(pred_distri.reshape(b, a, 4, self.reg_max), axis=-1) @ jnp.arange(
            self.reg_max, dtype=jnp.float32
        )
        pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # (B, A, 4) xyxy grid units

        gt_labels = targets["cls"].astype(jnp.int32)  # (B, M)
        gt_bboxes = targets["bboxes"].astype(jnp.float32)  # (B, M, 4) xyxy pixels
        mask_gt = targets["mask"].astype(jnp.float32)  # (B, M)
        # zero out padded slots so degenerate boxes can't catch anchors
        gt_bboxes = gt_bboxes * mask_gt[..., None]

        _, target_bboxes, target_scores, fg_mask, _ = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )
        target_scores_sum = jnp.maximum(jnp.sum(target_scores), 1.0)

        # cls: BCE over all anchors/classes (reference loss.py:225)
        loss_cls = jnp.sum(bce_with_logits(pred_scores, target_scores)) / target_scores_sum

        # box + dfl on foreground anchors (reference BboxLoss, loss.py:65)
        target_bboxes = target_bboxes / stride_tensor[None]
        weight = jnp.sum(target_scores, axis=-1) * fg_mask  # (B, A)
        iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)  # (B, A)
        loss_box = jnp.sum((1.0 - iou) * weight) / target_scores_sum

        target_ltrb = bbox2dist(anchor_points[None], target_bboxes, self.reg_max - 1)  # (B, A, 4)
        dfl_elem = df_loss(pred_distri.reshape(b, a, 4, self.reg_max), target_ltrb, self.reg_max)[..., 0]
        loss_dfl = jnp.sum(dfl_elem * weight) / target_scores_sum

        items = jnp.stack(
            [loss_box * self.gains["box"], loss_cls * self.gains["cls"], loss_dfl * self.gains["dfl"]]
        )
        # reference returns loss.sum() * batch_size (loss.py:260)
        return jnp.sum(items) * b, jax.lax.stop_gradient(items)
