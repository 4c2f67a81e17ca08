"""Pallas kernel correctness in interpreter mode (runs on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from drone_yolo_tpu.ops.pallas_nms import HAS_PALLAS, pallas_greedy_keep

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")


def _greedy_np(boxes, thr):
    n = len(boxes)
    keep = np.ones(n, bool)
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    for i in range(n):
        if not keep[i]:
            continue
        iw = np.clip(np.minimum(x2[i], x2) - np.maximum(x1[i], x1), 0, None)
        ih = np.clip(np.minimum(y2[i], y2) - np.maximum(y1[i], y1), 0, None)
        inter = iw * ih
        iou = inter / (areas[i] + areas - inter + 1e-7)
        sup = iou > thr
        sup[: i + 1] = False
        keep &= ~sup
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_nms_matches_sequential_greedy(seed):
    rng = np.random.default_rng(seed)
    b, k = 2, 128
    c = rng.random((b, k, 2)) * 100
    wh = rng.random((b, k, 2)) * 30 + 5
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    valid = rng.random((b, k)) > 0.3

    keep = np.asarray(pallas_greedy_keep(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True))
    for i in range(b):
        ref = np.zeros(k, bool)
        idx = np.nonzero(valid[i])[0]
        sub = _greedy_np(boxes[i][idx], 0.5)
        ref[idx[sub]] = True
        assert (ref == keep[i]).all()
