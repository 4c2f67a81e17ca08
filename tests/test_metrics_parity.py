"""Golden parity of the mAP computation (ap_per_class) vs the torch reference."""

import numpy as np
import pytest

from refshim import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")


def _random_eval(rng, n_pred=500, n_gt_cls=800, nc=10, t=10):
    tp = rng.random((n_pred, t)) < np.linspace(0.6, 0.2, t)  # monotone-ish TP rates
    # enforce TP monotonicity over IoU thresholds (true in real eval)
    tp = np.sort(tp.astype(int), axis=1)[:, ::-1].astype(bool)
    conf = rng.random(n_pred)
    pred_cls = rng.integers(0, nc, n_pred)
    target_cls = rng.integers(0, nc, n_gt_cls)
    return tp, conf, pred_cls, target_cls


@pytest.mark.parametrize("seed", [0, 1])
def test_ap_per_class_matches_reference(seed):
    import torch

    from ultralytics.utils.metrics import ap_per_class as ref_ap

    from drone_yolo_tpu.utils.metrics import ap_per_class

    rng = np.random.default_rng(seed)
    tp, conf, pred_cls, target_cls = _random_eval(rng)

    out = ap_per_class(tp, conf, pred_cls, target_cls)
    # reference returns (tp, fp, p, r, f1, ap, unique_classes, p_curve, r_curve, ...)
    ref_out = ref_ap(tp, conf, pred_cls, target_cls, plot=False)
    ref_ap_matrix = ref_out[5]
    np.testing.assert_allclose(out["ap"], ref_ap_matrix, rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(out["unique_classes"], ref_out[6])
    # P/R at max-F1 confidence
    np.testing.assert_allclose(out["p"], ref_out[2], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(out["r"], ref_out[3], rtol=1e-6, atol=1e-8)


def test_match_predictions_one_to_one():
    from drone_yolo_tpu.utils.metrics import match_predictions

    iouv = np.linspace(0.5, 0.95, 10)
    # 2 GT, 3 preds: pred0 overlaps gt0 strongly, pred1 overlaps gt0 weaker,
    # pred2 overlaps gt1
    iou = np.array([[0.9, 0.6, 0.0], [0.0, 0.0, 0.7]])
    pred_cls = np.array([0, 0, 1])
    true_cls = np.array([0, 1])
    tp = match_predictions(pred_cls, true_cls, iou, iouv)
    assert tp[0, 0] and not tp[1, 0]  # one-to-one: only the best pred matches gt0
    assert tp[2, 0]
    assert tp[0, iouv < 0.95].all()
