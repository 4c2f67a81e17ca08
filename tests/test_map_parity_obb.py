"""Cross-framework OBB mAP parity: the torch reference's OBBValidator and ours
on the SAME synthetic rotated-box dataset with the SAME converted yolov8n-obb
weights.

Exercises the rotated decode (angle channel, dist2rbox), rotated NMS
(probiou-based suppression both sides), rboxes-from-polygon GT conversion, and
probiou TP matching (reference models/yolo/obb/val.py:17-192).
"""

import numpy as np
import pytest

from make_dataset import make_obb_dataset
from refshim import load_reference

from drone_yolo_tpu.nn.model import OBBModel
from drone_yolo_tpu.utils.torch_convert import convert_state_dict

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

IMGSZ = 256
NC = 2


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("map_parity_obb")
    return make_obb_dataset(root, n_val=100, nc=NC, seed=17, size=IMGSZ)


@pytest.fixture(scope="module")
def converted_pair():
    import torch

    from ultralytics.nn.tasks import OBBModel as RefOBB

    torch.manual_seed(0)
    ref_m = RefOBB("yolov8n-obb.yaml", nc=NC, verbose=False)
    ref_m.eval()
    with torch.no_grad():
        for name, p in ref_m.named_parameters():
            if ".cv3." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(40.0)
            if ".cv2." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(4.0)
    ours = OBBModel("yolov8n-obb.yaml", nc=NC)
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    return ref_m, ours, variables


def _run_reference(ref_m, data_yaml):
    import torch

    from ultralytics.models.yolo.obb import OBBValidator as RefVal

    v = RefVal(
        args=dict(
            model="yolov8n-obb.yaml",
            data=str(data_yaml),
            imgsz=IMGSZ,
            batch=8,
            rect=False,
            device="cpu",
            half=False,
            plots=False,
            save_json=False,
            verbose=False,
            workers=0,
            mode="val",
            task="obb",
        )
    )
    v(model=ref_m)
    stats = {k: torch.cat(x, 0).cpu().numpy() for k, x in v.stats.items() if x}
    return {
        "map50": v.metrics.box.map50,
        "map": v.metrics.box.map,
        "conf": np.sort(stats["conf"])[::-1],
        "tp_sums": stats["tp"].sum(0),
        "n_preds": len(stats["conf"]),
    }


class _Facade:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def ensure_variables(self, imgsz=640, seed=0):
        return self.variables


def _run_ours(ours, variables, data_yaml):
    from drone_yolo_tpu.models.yolo.obb import OBBValidator

    v = OBBValidator(
        args=dict(
            data=str(data_yaml),
            imgsz=IMGSZ,
            batch=8,
            rect=False,
            conf=0.001,
            iou=0.7,
            max_det=300,
            pre_nms_topk=8192,
            workers=0,
            mode="val",
            task="obb",
            verbose=False,
            plots=False,
            save_json=False,
            half=False,
        )
    )
    stats = v(model=_Facade(ours, variables))
    conf = np.concatenate(v.stats["conf"]) if v.stats["conf"] else np.zeros(0)
    tp = np.concatenate(v.stats["tp"]) if v.stats["tp"] else np.zeros((0, 10), bool)
    return {
        "map50": stats["metrics/mAP50(B)"],
        "map": stats["metrics/mAP50-95(B)"],
        "conf": np.sort(conf)[::-1],
        "tp_sums": tp.sum(0),
        "n_preds": len(conf),
    }


def test_obb_map_parity(dataset, converted_pair):
    ref_m, ours, variables = converted_pair
    r = _run_reference(ref_m, dataset)
    o = _run_ours(ours, variables, dataset)
    print(
        f"[obb] ref mAP50={r['map50']:.5f} n={r['n_preds']} | ours mAP50={o['map50']:.5f} n={o['n_preds']}"
    )
    assert abs(r["map50"] - o["map50"]) <= 0.005
    assert abs(r["map"] - o["map"]) <= 0.005
    # rotated-NMS tie-breaks differ more readily than axis-aligned; allow 1%
    assert abs(r["n_preds"] - o["n_preds"]) <= max(5, 0.01 * r["n_preds"])
    n = min(r["n_preds"], o["n_preds"])
    np.testing.assert_allclose(r["conf"][: int(0.99 * n)], o["conf"][: int(0.99 * n)], atol=5e-3)
    denom = max(1, int(r["tp_sums"][0]))
    assert np.abs(r["tp_sums"] - o["tp_sums"]).max() <= max(3, 0.01 * denom)
