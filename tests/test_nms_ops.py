"""NMS fixed-point iteration vs sequential greedy reference; box op checks."""

import numpy as np
import jax.numpy as jnp

from drone_yolo_tpu.ops.boxes import bbox_iou, box_iou, xywh2xyxy, xyxy2xywh
from drone_yolo_tpu.ops.nms import _greedy_keep, _iou_matrix, non_max_suppression


def greedy_nms_reference(boxes, scores, thr):
    """Sequential greedy NMS in numpy (ground truth)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas - inter + 1e-7)
        suppressed |= iou > thr
    return sorted(keep)


def test_fixed_point_equals_sequential_greedy(rng):
    for trial in range(5):
        n = 200
        centers = rng.random((n, 2)) * 100
        wh = rng.random((n, 2)) * 30 + 5
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
        scores = rng.random(n).astype(np.float32)

        ref_keep = greedy_nms_reference(boxes, scores, 0.5)

        order = np.argsort(-scores)
        sb = boxes[order]
        iou = np.asarray(_iou_matrix(jnp.asarray(sb)))
        adj = np.triu(np.ones((n, n), bool), 1) & (iou > 0.5)
        keep_mask = np.asarray(_greedy_keep(jnp.asarray(adj), jnp.ones(n, bool)))
        got_keep = sorted(order[np.nonzero(keep_mask)[0]].tolist())
        assert got_keep == ref_keep, f"trial {trial}: mismatch"


def test_nms_end_to_end_multilabel(rng):
    """Batched NMS call: correct shapes, respects conf gate and max_det."""
    b, a, nc = 2, 300, 5
    boxes_c = rng.random((b, a, 2)) * 80 + 10
    boxes_wh = rng.random((b, a, 2)) * 20 + 4
    scores = (rng.random((b, a, nc)) ** 4).astype(np.float32)  # mostly below conf
    preds = np.concatenate([boxes_c, boxes_wh, scores], -1).astype(np.float32)

    dets, n_valid = non_max_suppression(jnp.asarray(preds), conf_thres=0.5, iou_thres=0.5, max_det=50, pre_topk=128, multi_label=True)
    dets, n_valid = np.asarray(dets), np.asarray(n_valid)
    assert dets.shape == (b, 50, 6)
    for i in range(b):
        n = n_valid[i]
        assert (dets[i, :n, 4] > 0.5).all()
        assert (dets[i, n:] == 0).all()
        # kept boxes of the same class must not overlap > thr
        d = dets[i, :n]
        for c in np.unique(d[:, 5]):
            sel = d[d[:, 5] == c]
            if len(sel) > 1:
                iou = np.array(box_iou(jnp.asarray(sel[:, :4]), jnp.asarray(sel[:, :4])))
                np.fill_diagonal(iou, 0)
                assert iou.max() <= 0.5 + 1e-5


def test_box_roundtrip(rng):
    b = rng.random((17, 4)).astype(np.float32)
    b[:, 2:] += 1.0
    out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_ciou_matches_definition():
    """CIoU of identical boxes is 1; disjoint boxes < 0 possible (penalty)."""
    a = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    assert float(bbox_iou(a, a, xywh=False, CIoU=True)[0]) > 0.999
    b = jnp.asarray([[100.0, 100.0, 120.0, 110.0]])
    v = float(bbox_iou(a, b, xywh=False, CIoU=True)[0])
    assert v < 0.0
