"""Cross-framework POSE mAP parity: the torch reference's PoseValidator and
ours on the SAME synthetic keypoint dataset with the SAME converted
yolov8n-pose weights — box AND OKS-pose mAP must agree.

Covers the kpt decode path (3*nkpt head channels, xy*2*stride anchor decode,
sigmoid visibility), kpt letterbox descaling, and the OKS matching protocol
(reference models/yolo/pose/val.py:17-283, utils/metrics.py kpt_iou with
area*0.53 and uniform sigmas for nkpt != 17).
"""

import numpy as np
import pytest

from make_dataset import make_pose_dataset
from refshim import load_reference

from drone_yolo_tpu.nn.model import PoseModel
from drone_yolo_tpu.utils.torch_convert import convert_state_dict

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

IMGSZ = 256
NC = 2
NKPT = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("map_parity_pose")
    return make_pose_dataset(root, n_val=100, nc=NC, seed=13, size=IMGSZ, nkpt=NKPT)


@pytest.fixture(scope="module")
def converted_pair():
    import torch

    from ultralytics.nn.tasks import PoseModel as RefPose

    torch.manual_seed(0)
    ref_m = RefPose("yolov8n-pose.yaml", nc=NC, data_kpt_shape=(NKPT, 3), verbose=False)
    ref_m.eval()
    with torch.no_grad():
        for name, p in ref_m.named_parameters():
            if ".cv3." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(40.0)
            if ".cv2." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(4.0)
            if ".cv4." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(4.0)  # kpt branch
    ours = PoseModel("yolov8n-pose.yaml", nc=NC, data_kpt_shape=(NKPT, 3))
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    return ref_m, ours, variables


def _run_reference(ref_m, data_yaml):
    import torch

    from ultralytics.models.yolo.pose import PoseValidator as RefVal

    v = RefVal(
        args=dict(
            model="yolov8n-pose.yaml",
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
            task="pose",
        )
    )
    v(model=ref_m)
    stats = {k: torch.cat(x, 0).cpu().numpy() for k, x in v.stats.items() if x}
    return {
        "box_map50": v.metrics.box.map50,
        "box_map": v.metrics.box.map,
        "pose_map50": v.metrics.pose.map50,
        "pose_map": v.metrics.pose.map,
        "conf": np.sort(stats["conf"])[::-1],
        "tp_sums": stats["tp"].sum(0),
        "tpp_sums": stats["tp_p"].sum(0),
        "n_preds": len(stats["conf"]),
    }


class _Facade:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def ensure_variables(self, imgsz=640, seed=0):
        return self.variables


def _run_ours(ours, variables, data_yaml):
    from drone_yolo_tpu.models.yolo.pose import PoseValidator

    v = PoseValidator(
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
            task="pose",
            verbose=False,
            plots=False,
            save_json=False,
            half=False,
        )
    )
    stats = v(model=_Facade(ours, variables))
    conf = np.concatenate(v.stats["conf"]) if v.stats["conf"] else np.zeros(0)
    tp = np.concatenate(v.stats["tp"]) if v.stats["tp"] else np.zeros((0, 10), bool)
    tpp = np.concatenate(v.stats["tp_p"]) if v.stats.get("tp_p") else np.zeros((0, 10), bool)
    return {
        "box_map50": stats["metrics/mAP50(B)"],
        "box_map": stats["metrics/mAP50-95(B)"],
        "pose_map50": stats["metrics/mAP50(P)"],
        "pose_map": stats["metrics/mAP50-95(P)"],
        "conf": np.sort(conf)[::-1],
        "tp_sums": tp.sum(0),
        "tpp_sums": tpp.sum(0),
        "n_preds": len(conf),
    }


def test_pose_map_parity(dataset, converted_pair):
    ref_m, ours, variables = converted_pair
    r = _run_reference(ref_m, dataset)
    o = _run_ours(ours, variables, dataset)
    print(
        f"[pose] ref box mAP50={r['box_map50']:.5f} pose mAP50={r['pose_map50']:.5f} n={r['n_preds']} | "
        f"ours box mAP50={o['box_map50']:.5f} pose mAP50={o['pose_map50']:.5f} n={o['n_preds']}"
    )
    assert abs(r["box_map50"] - o["box_map50"]) <= 0.005
    assert abs(r["box_map"] - o["box_map"]) <= 0.005
    assert abs(r["pose_map50"] - o["pose_map50"]) <= 0.005
    assert abs(r["pose_map"] - o["pose_map"]) <= 0.005
    assert abs(r["n_preds"] - o["n_preds"]) <= max(2, 0.002 * r["n_preds"])
    n = min(r["n_preds"], o["n_preds"])
    np.testing.assert_allclose(r["conf"][:n], o["conf"][:n], atol=2e-3)
    denom = max(1, int(r["tp_sums"][0]))
    assert np.abs(r["tp_sums"] - o["tp_sums"]).max() <= max(2, 0.005 * denom)
    denom_p = max(1, int(r["tpp_sums"][0]))
    assert np.abs(r["tpp_sums"] - o["tpp_sums"]).max() <= max(3, 0.01 * denom_p)


@pytest.mark.slow
def test_pose_map_parity_trained(dataset, tmp_path):
    """OKS agreement at meaningful pose mAP: train the torch reference briefly
    with its own v8PoseLoss, convert, and compare both validators."""
    import cv2
    import torch

    from pathlib import Path

    from ultralytics.nn.tasks import PoseModel as RefPose

    torch.manual_seed(0)
    ref_m = RefPose("yolov8n-pose.yaml", nc=NC, data_kpt_shape=(NKPT, 3), verbose=False)
    ref_m.args = type("A", (), {"box": 7.5, "cls": 0.5, "dfl": 1.5, "pose": 12.0, "kobj": 1.0})()
    criterion = ref_m.init_criterion()

    root = Path(dataset).parent
    files = sorted((root / "images" / "val").glob("*.jpg"))[:48]
    samples = []
    for f in files:
        img = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        rows = [
            np.asarray(line.split(), np.float64)
            for line in Path(str(f).replace("images", "labels").replace(".jpg", ".txt")).read_text().splitlines()
            if line.strip()
        ]
        samples.append((img, np.asarray(rows, np.float32)))

    # AdamW + grad clip: SGD lr=0.01 destabilizes aux branches (see seg twin)
    opt = torch.optim.AdamW(ref_m.parameters(), lr=2e-3, weight_decay=0.0)
    rng = np.random.default_rng(0)
    ref_m.train()
    for step in range(250):
        idx = rng.integers(0, len(samples), 4)
        imgs = torch.from_numpy(np.stack([samples[i][0] for i in idx]).transpose(0, 3, 1, 2))
        cls, boxes, bidx, kpts = [], [], [], []
        for bi, i in enumerate(idx):
            lb = samples[i][1]
            cls.append(lb[:, 0:1])
            boxes.append(lb[:, 1:5])
            kpts.append(lb[:, 5:].reshape(-1, NKPT, 3))
            bidx.append(np.full(len(lb), bi))
        batch = {
            "img": imgs,
            "cls": torch.from_numpy(np.concatenate(cls)).float(),
            "bboxes": torch.from_numpy(np.concatenate(boxes)).float(),
            "keypoints": torch.from_numpy(np.concatenate(kpts)).float(),
            "batch_idx": torch.from_numpy(np.concatenate(bidx)).float(),
        }
        loss, _ = criterion(ref_m(imgs), batch)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_m.parameters(), 10.0)
        opt.step()
    ref_m.eval()

    ours = PoseModel("yolov8n-pose.yaml", nc=NC, data_kpt_shape=(NKPT, 3))
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    r = _run_reference(ref_m, dataset)
    o = _run_ours(ours, variables, dataset)
    print(
        f"[pose-trained] ref box mAP50={r['box_map50']:.4f} pose mAP50={r['pose_map50']:.4f} | "
        f"ours box mAP50={o['box_map50']:.4f} pose mAP50={o['pose_map50']:.4f}"
    )
    assert r["pose_map50"] > 0.1, f"reference failed to learn keypoints (mAP50={r['pose_map50']})"
    assert abs(r["box_map50"] - o["box_map50"]) <= 0.01
    assert abs(r["pose_map50"] - o["pose_map50"]) <= 0.01
    assert abs(r["pose_map"] - o["pose_map"]) <= 0.02
    denom_p = max(1, int(r["tpp_sums"][0]))
    assert np.abs(r["tpp_sums"] - o["tpp_sums"]).max() <= max(3, 0.02 * denom_p)
