"""RT-DETR training loss: exact Hungarian matching + VFL/L1/GIoU with aux layers.

Capability parity with `ultralytics/models/utils/loss.py:1-357` (DETRLoss,
RTDETRDetectionLoss) and `models/utils/ops.py` (HungarianMatcher).

TPU note: host callbacks are unavailable inside jit on this runtime, so the
matcher cannot call scipy; matching runs fully on device via the exact
Hungarian solver in `ops/lap.py` (verified against scipy in tests/test_lap.py).
Padded GT slots are skipped by the solver's row mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drone_yolo_tpu.ops.boxes import bbox_iou, xywh2xyxy
from drone_yolo_tpu.ops.lap import linear_sum_assignment


def hungarian_assignment(cost, gt_mask):
    """Exact min-cost bipartite assignment on device.

    cost: (B, Q, M); gt_mask: (B, M). Returns (B, M) int32 query index per GT
    (padded GT slots get an arbitrary query; callers mask by gt_mask).
    """
    c = jnp.swapaxes(cost, 1, 2)  # rows = GT (small side), cols = queries
    return linear_sum_assignment(c, gt_mask > 0)


def greedy_assignment(cost, gt_mask):
    """On-device greedy min-cost bipartite assignment (kept for comparison and
    as a cheaper fallback; `hungarian_assignment` is the default matcher).

    cost: (B, Q, M); gt_mask: (B, M). Returns (B, M) int32 query index per GT.
    """
    b, q, m = cost.shape
    big = jnp.asarray(1e9, cost.dtype)
    cost = jnp.where(gt_mask[:, None, :] > 0, cost, big)

    def body(_, state):
        c, assigned = state
        flat = c.reshape(b, q * m)
        idx = jnp.argmin(flat, axis=-1)  # (B,)
        qi, mi = idx // m, idx % m
        valid_pick = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0] < big * 0.5
        assigned = jnp.where(
            valid_pick[:, None] & (jax.nn.one_hot(mi, m, dtype=bool)),
            qi[:, None].astype(jnp.int32),
            assigned,
        )
        # retire the chosen row and column
        row_mask = jax.nn.one_hot(qi, q, dtype=cost.dtype)[:, :, None]  # (B, Q, 1)
        col_mask = jax.nn.one_hot(mi, m, dtype=cost.dtype)[:, None, :]  # (B, 1, M)
        c = c + jnp.where(valid_pick[:, None, None], row_mask * big + col_mask * big, 0.0)
        return c, assigned

    assigned0 = jnp.zeros((b, m), jnp.int32)
    _, assigned = jax.lax.fori_loop(0, m, body, (cost, assigned0))
    return assigned


class RTDETRDetectionLoss:
    """VFL class loss + L1 + GIoU on Hungarian-matched queries, with per-decoder-
    layer auxiliary losses and the encoder head (reference RTDETRDetectionLoss)."""

    def __init__(self, nc: int = 80, class_gain: float = 1.0, bbox_gain: float = 5.0, giou_gain: float = 2.0, imgsz: int = 640):
        self.nc = nc
        self.g_cls, self.g_box, self.g_giou = class_gain, bbox_gain, giou_gain

    def _match(self, pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask):
        """Hungarian assignment. All boxes normalized cxcywh. Returns (B, M) query ids."""
        scores = jax.nn.sigmoid(pred_scores)  # (B, Q, nc)
        # focal-style class cost (reference HungarianMatcher: alpha=0.25 gamma=2)
        alpha, gamma = 0.25, 2.0
        gl = jnp.clip(gt_cls.astype(jnp.int32), 0, self.nc - 1)
        sc = jnp.take_along_axis(jnp.swapaxes(scores, 1, 2), gl[:, :, None], axis=1)  # (B, M, Q)
        sc = jnp.swapaxes(sc, 1, 2)  # (B, Q, M)
        neg = (1 - alpha) * (sc**gamma) * (-jnp.log(1 - sc + 1e-8))
        pos = alpha * ((1 - sc) ** gamma) * (-jnp.log(sc + 1e-8))
        cost_cls = pos - neg

        cost_l1 = jnp.sum(jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]), axis=-1)  # (B,Q,M)
        giou = bbox_iou(
            xywh2xyxy(pred_boxes)[:, :, None, :], xywh2xyxy(gt_boxes)[:, None, :, :], xywh=False, GIoU=True
        )
        cost = self.g_cls * cost_cls + self.g_box * cost_l1 + self.g_giou * (1.0 - giou)
        return hungarian_assignment(jax.lax.stop_gradient(cost), gt_mask)

    def _layer_loss(self, pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask, assigned):
        b, q, _ = pred_scores.shape
        m = gt_boxes.shape[1]
        # scatter GT targets onto assigned queries
        onehot_q = jax.nn.one_hot(assigned, q, dtype=jnp.float32) * gt_mask[:, :, None]  # (B, M, Q)
        matched = jnp.sum(onehot_q, axis=1) > 0  # (B, Q)
        # per-query target class one-hot
        cls_onehot = jax.nn.one_hot(jnp.clip(gt_cls.astype(jnp.int32), 0, self.nc - 1), self.nc)  # (B, M, nc)
        tgt_cls = jnp.einsum("bmq,bmc->bqc", onehot_q, cls_onehot)  # (B, Q, nc)
        # matched gt boxes per query
        tgt_box = jnp.einsum("bmq,bmd->bqd", onehot_q, gt_boxes)

        pb = jnp.where(matched[..., None], pred_boxes, 0.0)
        iou = jnp.clip(bbox_iou(xywh2xyxy(pb), xywh2xyxy(tgt_box), xywh=False), 0, None)  # (B, Q)
        iou = jax.lax.stop_gradient(iou) * matched

        # varifocal loss (reference VarifocalLoss): IoU-aware targets
        score = jax.nn.sigmoid(pred_scores)
        tgt_score = tgt_cls * iou[..., None]
        alpha, gamma = 0.75, 2.0
        weight = alpha * (score**gamma) * (1 - tgt_cls) + tgt_score
        bce = jnp.maximum(pred_scores, 0) - pred_scores * tgt_score + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
        n_gt = jnp.maximum(jnp.sum(gt_mask), 1.0)
        loss_cls = jnp.sum(bce * weight) / n_gt

        l1 = jnp.sum(jnp.abs(pred_boxes - tgt_box), axis=-1) * matched
        giou = bbox_iou(xywh2xyxy(pb), xywh2xyxy(tgt_box), xywh=False, GIoU=True)
        loss_box = jnp.sum(l1) / n_gt
        loss_giou = jnp.sum((1.0 - giou) * matched) / n_gt
        return self.g_cls * loss_cls, self.g_box * loss_box, self.g_giou * loss_giou

    def _dn_loss(self, pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask, dn_meta):
        """Fixed-assignment loss on the denoising block: positive copy i of GT j
        is assigned to GT j by construction (no matching)."""
        b, d4 = dn_meta["dn_pos"].shape
        m = gt_boxes.shape[1]
        reps = d4 // m
        tgt_boxes = jnp.tile(gt_boxes, (1, reps, 1))
        tgt_cls_ids = jnp.tile(jnp.clip(gt_cls.astype(jnp.int32), 0, self.nc - 1), (1, reps))
        pos = dn_meta["dn_pos"] * dn_meta["dn_valid"]  # (B, D)

        iou = jnp.clip(bbox_iou(xywh2xyxy(pred_boxes), xywh2xyxy(tgt_boxes), xywh=False), 0, None)
        iou = jax.lax.stop_gradient(iou) * pos
        tgt_onehot = jax.nn.one_hot(tgt_cls_ids, self.nc) * pos[..., None]
        tgt_score = tgt_onehot * iou[..., None]
        score = jax.nn.sigmoid(pred_scores)
        alpha, gamma = 0.75, 2.0
        weight = alpha * (score**gamma) * (1 - tgt_onehot) + tgt_score
        bce = jnp.maximum(pred_scores, 0) - pred_scores * tgt_score + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
        n_pos = jnp.maximum(jnp.sum(pos), 1.0)
        l1 = jnp.sum(jnp.abs(pred_boxes - tgt_boxes), axis=-1) * pos
        giou = bbox_iou(xywh2xyxy(pred_boxes * pos[..., None]), xywh2xyxy(tgt_boxes * pos[..., None]), xywh=False, GIoU=True)
        return (
            self.g_cls * jnp.sum(bce * weight) / n_pos,
            self.g_box * jnp.sum(l1) / n_pos,
            self.g_giou * jnp.sum((1.0 - giou) * pos) / n_pos,
        )

    def __call__(self, outs, targets):
        """outs = (dec_bboxes (L,B,D+Q,4), dec_scores, enc_bboxes, enc_scores[, dn_meta]);
        targets: {"cls" (B,M), "bboxes" (B,M,4) pixel xyxy, "mask" (B,M), "img": ...}."""
        dn_meta = None
        if len(outs) == 5:
            dec_bboxes, dec_scores, enc_bboxes, enc_scores, dn_meta = outs
        else:
            dec_bboxes, dec_scores, enc_bboxes, enc_scores = outs
        imgsz = float(targets["img"].shape[1]) if "img" in targets else float(targets.get("imgsz", 640.0))
        gt_mask = targets["mask"].astype(jnp.float32)
        gt_cls = targets["cls"]
        bb = targets["bboxes"].astype(jnp.float32) / imgsz  # normalized xyxy
        gt_boxes = jnp.concatenate([(bb[..., :2] + bb[..., 2:]) / 2, bb[..., 2:] - bb[..., :2]], axis=-1)
        gt_boxes = gt_boxes * gt_mask[..., None]

        d = dn_meta["d"] if dn_meta is not None else 0
        total_cls = total_box = total_giou = jnp.zeros(())
        layers = [(enc_bboxes, enc_scores)] + [(dec_bboxes[i], dec_scores[i]) for i in range(dec_bboxes.shape[0])]
        for li, (pb, ps) in enumerate(layers):
            if li > 0 and d:  # decoder layers carry the dn block up front
                dn_pb, pb = pb[:, :d], pb[:, d:]
                dn_ps, ps = ps[:, :d], ps[:, d:]
                lc, lb, lg = self._dn_loss(dn_pb, dn_ps, gt_boxes, gt_cls, gt_mask, dn_meta)
                total_cls += lc
                total_box += lb
                total_giou += lg
            assigned = self._match(jax.lax.stop_gradient(pb), jax.lax.stop_gradient(ps), gt_boxes, gt_cls, gt_mask)
            lc, lb, lg = self._layer_loss(pb, ps, gt_boxes, gt_cls, gt_mask, assigned)
            total_cls += lc
            total_box += lb
            total_giou += lg

        items = jnp.stack([total_cls, total_box, total_giou])
        return jnp.sum(items), jax.lax.stop_gradient(items)
