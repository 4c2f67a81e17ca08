"""Cross-framework SEGMENTATION mAP parity: the torch reference's
SegmentationValidator and ours on the SAME synthetic polygon dataset with the
SAME converted yolov8n-seg weights — box AND mask mAP50/mAP50-95 must agree.

Extends tests/test_map_parity.py (detect) to the mask protocol: proto-resolution
process_mask (reference ops.py:679, logits>0 == sigmoid>0.5), overlap-encoded
GT masks at mask_ratio 4 (reference segment/val.py:195-204), mask_iou matching.
"""

import numpy as np
import pytest

from make_dataset import make_seg_dataset
from refshim import load_reference

from drone_yolo_tpu.nn.model import SegmentationModel
from drone_yolo_tpu.utils.torch_convert import convert_state_dict

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

IMGSZ = 256
NC = 4


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("map_parity_seg")
    return make_seg_dataset(root, n_val=100, nc=NC, seed=11, size=IMGSZ)


@pytest.fixture(scope="module")
def converted_pair():
    import torch

    from ultralytics.nn.tasks import SegmentationModel as RefSeg

    torch.manual_seed(0)
    ref_m = RefSeg("yolov8n-seg.yaml", nc=NC, verbose=False)
    ref_m.eval()
    # amplify head convs so scores/boxes/coeffs vary spatially (see
    # test_map_parity.py converted_pair for rationale)
    with torch.no_grad():
        for name, p in ref_m.named_parameters():
            if ".cv3." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(40.0)
            if ".cv2." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(4.0)
            if ".cv4." in name and name.endswith("weight") and p.ndim == 4:
                p.mul_(4.0)  # mask-coefficient branch
    ours = SegmentationModel("yolov8n-seg.yaml", nc=NC)
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    return ref_m, ours, variables


def _run_reference(ref_m, data_yaml):
    import torch

    from ultralytics.models.yolo.segment import SegmentationValidator as RefVal

    v = RefVal(
        args=dict(
            model="yolov8n-seg.yaml",
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
            task="segment",
        )
    )
    v(model=ref_m)
    stats = {k: torch.cat(x, 0).cpu().numpy() for k, x in v.stats.items() if x}
    return {
        "box_map50": v.metrics.box.map50,
        "box_map": v.metrics.box.map,
        "seg_map50": v.metrics.seg.map50,
        "seg_map": v.metrics.seg.map,
        "conf": np.sort(stats["conf"])[::-1],
        "tp_sums": stats["tp"].sum(0),
        "tpm_sums": stats["tp_m"].sum(0),
        "n_preds": len(stats["conf"]),
    }


class _Facade:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def ensure_variables(self, imgsz=640, seed=0):
        return self.variables


def _run_ours(ours, variables, data_yaml):
    from drone_yolo_tpu.models.yolo.segment import SegmentationValidator

    v = SegmentationValidator(
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
            task="segment",
            verbose=False,
            plots=False,
            save_json=False,
            half=False,
        )
    )
    stats = v(model=_Facade(ours, variables))
    conf = np.concatenate(v.stats["conf"]) if v.stats["conf"] else np.zeros(0)
    tp = np.concatenate(v.stats["tp"]) if v.stats["tp"] else np.zeros((0, 10), bool)
    tpm = np.concatenate(v.stats["tp_m"]) if v.stats.get("tp_m") else np.zeros((0, 10), bool)
    return {
        "box_map50": stats["metrics/mAP50(B)"],
        "box_map": stats["metrics/mAP50-95(B)"],
        "seg_map50": stats["metrics/mAP50(M)"],
        "seg_map": stats["metrics/mAP50-95(M)"],
        "conf": np.sort(conf)[::-1],
        "tp_sums": tp.sum(0),
        "tpm_sums": tpm.sum(0),
        "n_preds": len(conf),
    }


def test_seg_map_parity(dataset, converted_pair):
    ref_m, ours, variables = converted_pair
    r = _run_reference(ref_m, dataset)
    o = _run_ours(ours, variables, dataset)
    print(
        f"[seg] ref box mAP50={r['box_map50']:.5f} mask mAP50={r['seg_map50']:.5f} n={r['n_preds']} | "
        f"ours box mAP50={o['box_map50']:.5f} mask mAP50={o['seg_map50']:.5f} n={o['n_preds']}"
    )
    assert abs(r["box_map50"] - o["box_map50"]) <= 0.005
    assert abs(r["box_map"] - o["box_map"]) <= 0.005
    assert abs(r["seg_map50"] - o["seg_map50"]) <= 0.005
    assert abs(r["seg_map"] - o["seg_map"]) <= 0.005
    assert abs(r["n_preds"] - o["n_preds"]) <= max(2, 0.002 * r["n_preds"])
    n = min(r["n_preds"], o["n_preds"])
    np.testing.assert_allclose(r["conf"][:n], o["conf"][:n], atol=2e-3)
    denom = max(1, int(r["tp_sums"][0]))
    assert np.abs(r["tp_sums"] - o["tp_sums"]).max() <= max(2, 0.005 * denom)
    denom_m = max(1, int(r["tpm_sums"][0]))
    assert np.abs(r["tpm_sums"] - o["tpm_sums"]).max() <= max(3, 0.01 * denom_m)


@pytest.mark.slow
def test_seg_map_parity_trained(dataset, tmp_path):
    """Mask-protocol agreement at MEANINGFUL mask mAP: briefly train the torch
    reference (its own v8SegmentationLoss) on the synthetic polygon set, convert,
    and compare both validators' box AND mask metrics."""
    import cv2
    import torch

    from pathlib import Path

    from ultralytics.nn.tasks import SegmentationModel as RefSeg

    torch.manual_seed(0)
    ref_m = RefSeg("yolov8n-seg.yaml", nc=NC, verbose=False)
    ref_m.args = type("A", (), {"box": 7.5, "cls": 0.5, "dfl": 1.5, "overlap_mask": True})()
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
        # per-instance masks at /4 with overlap encoding: larger instances get
        # lower ids so small ones win (reference data/utils.py:253 semantics)
        h4, w4 = IMGSZ // 4, IMGSZ // 4
        inst = []
        for r in rows:
            cls = int(r[0])
            pts = r[1:].reshape(-1, 2) * IMGSZ
            m = np.zeros((h4, w4), np.uint8)
            cv2.fillPoly(m, [(pts / 4).astype(np.int32)], 1)
            xy = pts
            x1, y1 = xy[:, 0].min() / IMGSZ, xy[:, 1].min() / IMGSZ
            x2, y2 = xy[:, 0].max() / IMGSZ, xy[:, 1].max() / IMGSZ
            box = ((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1)
            inst.append((cls, box, m, int(m.sum())))
        inst.sort(key=lambda t: -t[3])  # area desc -> id order
        overlap = np.zeros((h4, w4), np.float32)
        for j, (_, _, m, _) in enumerate(inst):
            overlap[m.astype(bool)] = j + 1
        samples.append((img, inst, overlap))

    # SGD lr=0.01 destabilizes the mask branch (loss spike ~step 10); AdamW +
    # grad clip converges to ~perfect synthetic mAP in ~240 steps
    opt = torch.optim.AdamW(ref_m.parameters(), lr=2e-3, weight_decay=0.0)
    rng = np.random.default_rng(0)
    ref_m.train()
    for step in range(240):
        idx = rng.integers(0, len(samples), 4)
        imgs = torch.from_numpy(np.stack([samples[i][0] for i in idx]).transpose(0, 3, 1, 2))
        cls, boxes, bidx, masks = [], [], [], []
        for bi, i in enumerate(idx):
            for c, b, _, _ in samples[i][1]:
                cls.append([c])
                boxes.append(b)
                bidx.append(bi)
            masks.append(samples[i][2])
        batch = {
            "img": imgs,
            "cls": torch.tensor(cls, dtype=torch.float32),
            "bboxes": torch.tensor(np.asarray(boxes), dtype=torch.float32),
            "batch_idx": torch.tensor(bidx, dtype=torch.float32),
            "masks": torch.from_numpy(np.stack(masks)),
        }
        loss, _ = criterion(ref_m(imgs), batch)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_m.parameters(), 10.0)
        opt.step()
    ref_m.eval()

    ours = SegmentationModel("yolov8n-seg.yaml", nc=NC)
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    r = _run_reference(ref_m, dataset)
    o = _run_ours(ours, variables, dataset)
    print(
        f"[seg-trained] ref box mAP50={r['box_map50']:.4f} mask mAP50={r['seg_map50']:.4f} | "
        f"ours box mAP50={o['box_map50']:.4f} mask mAP50={o['seg_map50']:.4f}"
    )
    assert r["seg_map50"] > 0.2, f"reference failed to learn masks (mAP50={r['seg_map50']})"
    assert abs(r["box_map50"] - o["box_map50"]) <= 0.01
    assert abs(r["box_map"] - o["box_map"]) <= 0.02
    assert abs(r["seg_map50"] - o["seg_map50"]) <= 0.01
    # mAP50-95 masks are single-pixel sensitive at high IoU; 0.02 abs
    assert abs(r["seg_map"] - o["seg_map"]) <= 0.02
    # raw TP counts at IoU 0.9/0.95 flip on single borderline mask pixels
    # (conv numerics differ ~1e-6 across frameworks); mAP agreement above is
    # the meaningful bound, so allow 5% here
    denom_m = max(1, int(r["tpm_sums"][0]))
    assert np.abs(r["tpm_sums"] - o["tpm_sums"]).max() <= max(3, 0.05 * denom_m)
