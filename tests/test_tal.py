"""Unit tests for the TAL assigner's TPU-shaped internals.

The end-to-end assigner semantics are pinned against the torch reference in
test_loss_parity.py (reference ultralytics/utils/tal.py:14-295); these tests
are reference-free and cover the dense-label-regime optimizations
(drone_yolo_tpu/utils/tal.py) at the exact-equality level the optimizations
promise:

- anchor-axis padding (a_pad) is output-invariant,
- _ciou_gt_pd == broadcast bbox_iou(CIoU),
- _fpow == ** for the assigner's exponents,
- kth_largest == sorted golden (including heavy ties).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drone_yolo_tpu.ops.boxes import bbox_iou
from drone_yolo_tpu.utils import tal


def _dense_inputs(rng, b=2, m=64, nobj=50, imgsz=256, nc=4, strides=(4, 8, 16, 32)):
    """Random plausible assigner inputs at an A large enough to trip a_pad."""
    from drone_yolo_tpu.ops.anchors import make_anchors

    feat_shapes = [(imgsz // s, imgsz // s) for s in strides]
    anc, st = make_anchors(feat_shapes, strides, 0.5)
    a = anc.shape[0]
    pd_scores = rng.uniform(0, 1, (b, a, nc)).astype(np.float32)
    ctr = np.asarray(anc) * np.asarray(st)
    wh = rng.uniform(4, 64, (b, a, 2)).astype(np.float32)
    pd_bboxes = np.concatenate([ctr[None] - wh / 2, ctr[None] + wh / 2], -1).astype(np.float32)
    w = rng.uniform(4, 36, (b, m)).astype(np.float32)
    h = rng.uniform(4, 36, (b, m)).astype(np.float32)
    cx = rng.uniform(36, imgsz - 36, (b, m)).astype(np.float32)
    cy = rng.uniform(36, imgsz - 36, (b, m)).astype(np.float32)
    gt = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    mask = (np.arange(m)[None] < nobj).astype(np.float32) * np.ones((b, 1), np.float32)
    gt = gt * mask[..., None]
    labels = rng.integers(0, nc, (b, m)).astype(np.int32)
    return tuple(jnp.asarray(v) for v in (pd_scores, pd_bboxes, ctr, labels, gt, mask))


def test_anchor_pad_output_invariant(rng):
    """assign()'s anchor-axis pad (a_pad, tal.py) must be exactly invisible.

    imgsz=256 with the P2 stride set gives A=5440 > 4*topk*128=5120, so the
    padded branch is active; the golden is the same source with the pad
    disabled (a structural no-op at the semantics level)."""
    inputs = _dense_inputs(rng)
    a = inputs[0].shape[1]
    assert a > 4 * 10 * 128 and a % 128 != 0, "shape no longer exercises the pad branch"

    out_pad = tal.assign(*inputs, num_classes=4)

    import drone_yolo_tpu.utils.tal as tal_mod

    src = open(tal_mod.__file__).read()
    needle = "a_pad = (-a) % 128 if a > 4 * topk * 128 else 0"
    assert needle in src, "pad-gate line moved; update this test"
    ns = {}
    exec(compile(src.replace(needle, "a_pad = 0"), "tal_nopad", "exec"), ns)
    out_ref = ns["assign"](*inputs, num_classes=4)

    for name, got, want in zip(
        ("target_labels", "target_bboxes", "target_scores", "fg_mask", "target_gt_idx"), out_pad, out_ref
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want), err_msg=name)


def test_ciou_gt_pd_matches_bbox_iou(rng):
    """_ciou_gt_pd (hoisted-arctan CIoU) == broadcast bbox_iou(..., CIoU=True)."""
    b, m, a = 3, 16, 64
    gt = rng.uniform(0, 100, (b, m, 2)).astype(np.float32)
    gt = np.concatenate([gt, gt + rng.uniform(1, 50, (b, m, 2)).astype(np.float32)], -1)
    pd = rng.uniform(0, 100, (b, a, 2)).astype(np.float32)
    pd = np.concatenate([pd, pd + rng.uniform(1, 50, (b, a, 2)).astype(np.float32)], -1)
    got = tal._ciou_gt_pd(jnp.asarray(gt), jnp.asarray(pd))
    want = bbox_iou(jnp.asarray(gt)[:, :, None, :], jnp.asarray(pd)[:, None, :, :], xywh=False, CIoU=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("p", [0.5, 1.0, 2.0, 3.0, 6.0, 8.0, 0.25, 1.7])
def test_fpow_matches_pow(rng, p):
    x = jnp.asarray(rng.uniform(0, 4, (257,)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(tal._fpow(x, p)), np.asarray(x**p), rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("n,k", [(300, 10), (512, 10), (5440, 13), (129, 3)])
def test_kth_largest_golden(rng, n, k):
    x = rng.standard_normal((2, 5, n)).astype(np.float32)
    # heavy ties: quantize half the rows so duplicate values straddle blocks
    x[:, ::2] = np.round(x[:, ::2] * 4) / 4
    got = np.asarray(tal.kth_largest(jnp.asarray(x), k))
    want = np.sort(x, axis=-1)[..., ::-1][..., k - 1 : k]
    np.testing.assert_array_equal(got, want)
