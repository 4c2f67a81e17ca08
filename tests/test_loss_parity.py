"""Golden parity of TAL assignment + v8 detection loss vs the torch reference.

Same converted random weights, same image, same labels -> loss components must
match. This exercises the assigner end to end (candidate selection, top-k,
conflict resolution, score normalization) plus CIoU/DFL/BCE reductions.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.nn.model import DetectionModel
from drone_yolo_tpu.utils.loss import v8DetectionLoss
from drone_yolo_tpu.utils.torch_convert import convert_state_dict

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

CFG = "/root/repo/drone_yolo_tpu/cfg/models/v8/yolov8.yaml"


def _random_batch(rng, b=2, n_per_img=(3, 5), imgsz=64):
    """Random normalized-xywh labels like a dataloader batch."""
    batch_idx, cls, boxes = [], [], []
    for i in range(b):
        n = n_per_img[i % len(n_per_img)]
        cxy = rng.uniform(0.2, 0.8, (n, 2))
        wh = rng.uniform(0.1, 0.3, (n, 2))
        boxes.append(np.concatenate([cxy, wh], -1))
        cls.append(rng.integers(0, 80, (n, 1)))
        batch_idx.append(np.full((n,), i))
    return (
        np.concatenate(batch_idx).astype(np.float32),
        np.concatenate(cls).astype(np.float32),
        np.concatenate(boxes).astype(np.float32),
    )


def test_detection_loss_parity():
    import torch

    from ultralytics.nn.tasks import DetectionModel as RefDet
    from ultralytics.utils import IterableSimpleNamespace

    torch.manual_seed(0)
    ref_m = RefDet(CFG, verbose=False)
    ref_m.train()
    ref_m.args = IterableSimpleNamespace(box=7.5, cls=0.5, dfl=1.5)

    rng = np.random.default_rng(3)
    imgsz = 64
    x = rng.random((2, 3, imgsz, imgsz), np.float32)
    batch_idx, cls, boxes = _random_batch(rng, b=2, imgsz=imgsz)

    batch = {
        "img": torch.from_numpy(x),
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(boxes),
    }
    with torch.no_grad():
        ref_total, ref_items = ref_m.loss(batch)
    ref_total, ref_items = float(ref_total.sum()), ref_items.numpy()

    # ours: same weights, padded targets in pixel xyxy
    ours = DetectionModel(CFG)
    variables = convert_state_dict(ours, ref_m.state_dict())
    ctx = M.Ctx(train=True, dtype=jnp.float32)
    feats = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), ctx=ctx)

    max_boxes = 8
    b = 2
    tcls = np.zeros((b, max_boxes), np.float32)
    tbox = np.zeros((b, max_boxes, 4), np.float32)
    tmask = np.zeros((b, max_boxes), np.float32)
    for i in range(b):
        sel = batch_idx == i
        n = int(sel.sum())
        tcls[i, :n] = cls[sel, 0]
        cxy, wh = boxes[sel, :2] * imgsz, boxes[sel, 2:] * imgsz
        tbox[i, :n, :2] = cxy - wh / 2
        tbox[i, :n, 2:] = cxy + wh / 2
        tmask[i, :n] = 1.0

    criterion = v8DetectionLoss(ours)
    total, items = criterion(feats, {"cls": jnp.asarray(tcls), "bboxes": jnp.asarray(tbox), "mask": jnp.asarray(tmask)})

    np.testing.assert_allclose(np.asarray(items), ref_items, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(total), ref_total, rtol=2e-3)


def test_varifocal_focal_parity():
    """Standalone VFL/Focal alternates match reference loss.py:16-63 exactly."""
    import torch

    from drone_yolo_tpu.utils.loss import focal_loss, varifocal_loss

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(4, 80)).astype(np.float32) * 3
    gt_score = rng.random((4, 80), np.float32)
    label = (rng.random((4, 80)) > 0.7).astype(np.float32)

    ref_vfl = ref.utils.loss.VarifocalLoss.forward(
        torch.tensor(logits), torch.tensor(gt_score), torch.tensor(label)
    ).item()
    ours_vfl = float(varifocal_loss(jnp.asarray(logits), jnp.asarray(gt_score), jnp.asarray(label)))
    np.testing.assert_allclose(ours_vfl, ref_vfl, rtol=1e-5)

    ref_fl = ref.utils.loss.FocalLoss.forward(torch.tensor(logits), torch.tensor(label)).item()
    ours_fl = float(focal_loss(jnp.asarray(logits), jnp.asarray(label)))
    np.testing.assert_allclose(ours_fl, ref_fl, rtol=1e-5)
