"""Segmentation mask-TP evaluation: a perfect prediction must be TP at all IoUs."""

import numpy as np


def test_perfect_mask_prediction_is_tp():
    from drone_yolo_tpu.models.yolo.segment import SegmentationValidator

    v = SegmentationValidator(args={"task": "segment", "conf": 0.25, "iou": 0.7})
    v.nc = 2
    v.seen = 0
    v.stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
    v.iouv = np.linspace(0.5, 0.95, 10)
    v.args.plots = False
    v.args.save_json = False

    in_shape = (64, 64)
    hm, wm, nm = 16, 16, 4
    om = np.zeros((1, hm, wm), np.int32)
    om[0, 2:8, 2:8] = 1
    protos = np.zeros((1, hm, wm, nm), np.float32)
    protos[0, 2:8, 2:8, 0] = 10.0
    dets = np.zeros((1, 300, 6 + nm), np.float32)
    dets[0, 0, :6] = [8, 8, 32, 32, 0.9, 0]
    dets[0, 0, 6] = 5.0
    batch = {
        "mask": np.array([[1.0]]),
        "bboxes": np.array([[[8, 8, 32, 32]]], np.float32),
        "cls": np.array([[0.0]]),
        "ori_shapes": [(64, 64)],
        "ratio_pads": [(1.0, (0.0, 0.0))],
        "masks": om,
        "im_files": ["x.jpg"],
    }
    v.update_metrics((dets, protos), np.array([1]), batch, in_shape)
    assert v.stats["tp_m"][0][0].all(), "perfect mask must be TP at every IoU threshold"
    assert v.stats["tp"][0][0].all(), "perfect box must be TP at every IoU threshold"
