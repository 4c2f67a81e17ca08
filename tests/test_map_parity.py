"""Cross-framework mAP parity: the torch reference's DetectionValidator and ours
run on the SAME synthetic dataset with the SAME (converted) weights, and the
resulting mAP50 / mAP50-95 must agree to <=0.005 absolute.

This is the de-facto end-to-end parity harness the reference expresses as
benchmark-as-test (reference .github/workflows/ci.yaml:138-146,
ultralytics/utils/benchmarks.py:51-202): it exercises image loading, letterbox,
forward, NMS (conf=0.001, iou=0.7, multi_label), scale_boxes, TP matching, and
ap_per_class in both frameworks simultaneously. Box-level agreement is asserted
via the per-detection confidence vectors and the TP-count matrix.
"""

from pathlib import Path

import numpy as np
import pytest

from make_dataset import make_dataset_mixed
from refshim import load_reference

from drone_yolo_tpu.nn.model import DetectionModel
from drone_yolo_tpu.utils.torch_convert import convert_state_dict

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

IMGSZ = 256
NC = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("map_parity")
    yaml_path = make_dataset_mixed(root, n_val=200, nc=NC, seed=7, base=IMGSZ)
    return yaml_path


@pytest.fixture(scope="module")
def converted_pair():
    """Seeded reference YOLOv8n (nc=4) and our model with its converted weights."""
    import torch

    from ultralytics.nn.tasks import DetectionModel as RefDet

    torch.manual_seed(0)
    ref_m = RefDet("yolov8n.yaml", nc=NC, verbose=False)
    ref_m.eval()
    # A freshly-initialized head yields near-constant confidences (the class
    # prior bias dominates), so every NMS tie-break differs by fp noise and a
    # box-level comparison is meaningless. Amplify the final head convs so
    # scores/boxes vary spatially; predictions stay garbage but deterministic.
    with torch.no_grad():
        for name, p in ref_m.named_parameters():
            if ".cv3." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(40.0)
            if ".cv2." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(4.0)
    ours = DetectionModel("yolov8n.yaml", nc=NC)
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    return ref_m, ours, variables


def _run_reference(ref_m, data_yaml, rect):
    from ultralytics.models.yolo.detect import DetectionValidator as RefVal

    args = dict(
        model="yolov8n.yaml",
        data=str(data_yaml),
        imgsz=IMGSZ,
        batch=8,
        rect=rect,
        device="cpu",
        half=False,
        plots=False,
        save_json=False,
        verbose=False,
        workers=0,
        mode="val",
        task="detect",
    )
    v = RefVal(args=args)
    v(model=ref_m)
    import torch

    stats = {k: torch.cat(x, 0).cpu().numpy() for k, x in v.stats.items() if x}
    return {
        "map50": v.metrics.box.map50,
        "map": v.metrics.box.map,
        "mp": v.metrics.box.mp,
        "mr": v.metrics.box.mr,
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


def _run_ours(ours, variables, data_yaml, rect):
    from drone_yolo_tpu.engine.validator import DetectionValidator

    v = DetectionValidator(
        args=dict(
            data=str(data_yaml),
            imgsz=IMGSZ,
            batch=8,
            rect=rect,
            conf=0.001,
            iou=0.7,
            max_det=300,
            pre_nms_topk=8192,
            workers=0,
            mode="val",
            task="detect",
            verbose=False,
            plots=False,
            save_json=False,
            half=False,
        )
    )
    stats = v(model=_Facade(ours, variables))
    conf = np.concatenate([c for c in v.stats["conf"]]) if v.stats["conf"] else np.zeros(0)
    tp = (
        np.concatenate(v.stats["tp"])
        if v.stats["tp"]
        else np.zeros((0, 10), bool)
    )
    return {
        "map50": stats["metrics/mAP50(B)"],
        "map": stats["metrics/mAP50-95(B)"],
        "mp": stats["metrics/precision(B)"],
        "mr": stats["metrics/recall(B)"],
        "conf": np.sort(conf)[::-1],
        "tp_sums": tp.sum(0),
        "n_preds": len(conf),
    }


def _assert_agreement(r, o, tag):
    print(
        f"[{tag}] ref mAP50={r['map50']:.5f} mAP={r['map']:.5f} n={r['n_preds']} | "
        f"ours mAP50={o['map50']:.5f} mAP={o['map']:.5f} n={o['n_preds']}"
    )
    assert abs(r["map50"] - o["map50"]) <= 0.005, (r["map50"], o["map50"])
    assert abs(r["map"] - o["map"]) <= 0.005, (r["map"], o["map"])
    assert abs(r["mp"] - o["mp"]) <= 0.02
    assert abs(r["mr"] - o["mr"]) <= 0.02
    # box-level agreement: same number of surviving detections (tiny slack for
    # conf-threshold ties) and same sorted confidence spectrum
    assert abs(r["n_preds"] - o["n_preds"]) <= max(2, 0.002 * r["n_preds"])
    n = min(r["n_preds"], o["n_preds"])
    np.testing.assert_allclose(r["conf"][:n], o["conf"][:n], atol=2e-3)
    # TP counts per IoU threshold within 0.5%
    denom = max(1, int(r["tp_sums"][0]))
    assert np.abs(r["tp_sums"] - o["tp_sums"]).max() <= max(2, 0.005 * denom), (
        r["tp_sums"],
        o["tp_sums"],
    )


def test_map_parity_square(dataset, converted_pair):
    """rect=False: square letterbox in both frameworks."""
    ref_m, ours, variables = converted_pair
    r = _run_reference(ref_m, dataset, rect=False)
    o = _run_ours(ours, variables, dataset, rect=False)
    _assert_agreement(r, o, "square")


def test_map_parity_rect(dataset, converted_pair):
    """rect=True: reference aspect-sorted rect batches vs our static-bucket rect."""
    ref_m, ours, variables = converted_pair
    r = _run_reference(ref_m, dataset, rect=True)
    o = _run_ours(ours, variables, dataset, rect=True)
    _assert_agreement(r, o, "rect")


@pytest.mark.slow
def test_map_parity_trained(dataset, tmp_path):
    """mAP agreement at a MEANINGFUL level: briefly train the torch reference on
    the synthetic set (its own v8DetectionLoss), convert the trained weights,
    and compare both validators — letterbox/NMS/matching discrepancies that are
    invisible at garbage mAP must stay invisible at real mAP too."""
    import torch

    from ultralytics.nn.tasks import DetectionModel as RefDet

    torch.manual_seed(0)
    ref_m = RefDet("yolov8n.yaml", nc=NC, verbose=False)
    ref_m.args = type("A", (), {"box": 7.5, "cls": 0.5, "dfl": 1.5})()
    criterion = ref_m.init_criterion()

    # training pool = the val images (agreement, not generalization, is on test)
    import cv2

    root = Path(dataset).parent
    files = sorted((root / "images" / "val").glob("*.jpg"))[:64]
    samples = []
    for f in files:
        img = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (IMGSZ, IMGSZ), interpolation=cv2.INTER_LINEAR)
        lb = np.loadtxt(str(f).replace("images", "labels").replace(".jpg", ".txt")).reshape(-1, 5)
        samples.append((img.astype(np.float32) / 255.0, lb))

    opt = torch.optim.SGD(ref_m.parameters(), lr=0.01, momentum=0.9)
    rng = np.random.default_rng(0)
    ref_m.train()
    for step in range(250):
        idx = rng.integers(0, len(samples), 4)
        imgs = torch.from_numpy(np.stack([samples[i][0] for i in idx]).transpose(0, 3, 1, 2))
        cls, boxes, bidx = [], [], []
        for bi, i in enumerate(idx):
            lb = samples[i][1]
            cls.append(lb[:, 0:1])
            boxes.append(lb[:, 1:])
            bidx.append(np.full(len(lb), bi))
        batch = {
            "img": imgs,
            "cls": torch.from_numpy(np.concatenate(cls)).float(),
            "bboxes": torch.from_numpy(np.concatenate(boxes)).float(),
            "batch_idx": torch.from_numpy(np.concatenate(bidx)).float(),
        }
        loss, _ = criterion(ref_m(imgs), batch)
        opt.zero_grad()
        loss.backward()
        opt.step()
    ref_m.eval()

    ours = DetectionModel("yolov8n.yaml", nc=NC)
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    r = _run_reference(ref_m, dataset, rect=False)
    o = _run_ours(ours, variables, dataset, rect=False)
    print(f"[trained] ref mAP50={r['map50']:.4f} ours={o['map50']:.4f}")
    assert r["map50"] > 0.25, f"reference failed to learn (mAP50={r['map50']})"
    _assert_agreement(r, o, "trained")
