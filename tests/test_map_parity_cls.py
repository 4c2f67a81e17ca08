"""Cross-framework CLASSIFICATION val parity: reference ClassificationValidator
vs ours, same folder dataset, same converted yolov8n-cls weights — top-1/top-5
accuracy must agree exactly (finite label set, no matching protocol slack).

Images are generated at exactly imgsz so the shortest-edge-resize + center-crop
val transform (reference augment.py:2355 classify_transforms) is identity in
both frameworks and the comparison isolates the model + argmax protocol.
"""

from pathlib import Path

import numpy as np
import pytest

from refshim import load_reference

from drone_yolo_tpu.nn.model import ClassificationModel
from drone_yolo_tpu.utils.torch_convert import convert_state_dict

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

IMGSZ = 64
NC = 5


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("map_parity_cls")
    rng = np.random.default_rng(29)
    for split, n_per in (("train", 2), ("val", 20)):
        for c in range(NC):
            d = root / split / f"class_{c}"
            d.mkdir(parents=True, exist_ok=True)
            base = np.array([40 + 40 * c, 220 - 35 * c, 60 + 25 * c], np.float32)
            for i in range(n_per):
                img = np.clip(rng.normal(base, 45, (IMGSZ, IMGSZ, 3)), 0, 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{split}_{i:03d}.jpg"), img[:, :, ::-1])
    return root


@pytest.fixture(scope="module")
def converted_pair():
    import torch

    from ultralytics.nn.tasks import ClassificationModel as RefCls

    torch.manual_seed(0)
    ref_m = RefCls("yolov8n-cls.yaml", nc=NC, verbose=False)
    ref_m.eval()
    ours = ClassificationModel("yolov8n-cls.yaml", nc=NC)
    variables = convert_state_dict(ours, dict(ref_m.state_dict()))
    return ref_m, ours, variables


def test_cls_val_parity(dataset, converted_pair):
    import torch

    from ultralytics.models.yolo.classify import ClassificationValidator as RefVal

    from drone_yolo_tpu.models.yolo.classify import ClassificationValidator

    ref_m, ours, variables = converted_pair

    # the torchvision stub (tests/refshim.py) has no datasets/transforms, so
    # feed the reference validator an explicit dataloader: images are already
    # imgsz so the val transform it replaces is identity
    import cv2

    class _TorchFolder(torch.utils.data.Dataset):
        def __init__(self, root):
            self.samples = []
            for c, d in enumerate(sorted(Path(root).iterdir())):
                for f in sorted(d.glob("*.jpg")):
                    self.samples.append((str(f), c))

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            path, label = self.samples[i]
            im = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
            t = torch.from_numpy(im.transpose(2, 0, 1).copy()).float() / 255.0
            return {"img": t, "cls": label}

    loader = torch.utils.data.DataLoader(_TorchFolder(dataset / "val"), batch_size=8, shuffle=False)
    v = RefVal(
        dataloader=loader,
        args=dict(
            model="yolov8n-cls.yaml",
            data=str(dataset),
            imgsz=IMGSZ,
            batch=8,
            device="cpu",
            half=False,
            plots=False,
            verbose=False,
            workers=0,
            mode="val",
            task="classify",
        ),
    )
    v(model=ref_m)
    r_top1, r_top5 = float(v.metrics.top1), float(v.metrics.top5)

    class _Facade:
        model = ours

        def ensure_variables(self, imgsz=64, seed=0):
            return variables

    f = _Facade()
    f.variables = variables
    ov = ClassificationValidator(
        args=dict(
            data=str(dataset),
            imgsz=IMGSZ,
            batch=8,
            workers=0,
            mode="val",
            task="classify",
            verbose=False,
            plots=False,
            half=False,
        )
    )
    stats = ov(model=f, variables=variables)
    o_top1, o_top5 = float(stats["metrics/accuracy_top1"]), float(stats["metrics/accuracy_top5"])
    print(f"[cls] ref top1={r_top1:.4f} top5={r_top5:.4f} | ours top1={o_top1:.4f} top5={o_top5:.4f}")
    # finite label set -> identical predictions expected; 1 image of slack for
    # borderline logits
    n_val = NC * 20
    assert abs(r_top1 - o_top1) <= 1.0 / n_val + 1e-9
    assert abs(r_top5 - o_top5) <= 1.0 / n_val + 1e-9
    # per-image agreement: the full top-5 index sequence must match (stronger
    # than aggregate accuracy, which can coincide by chance at random weights)
    r_pred = torch.cat(v.pred, 0).numpy()
    o_pred = np.concatenate(ov.pred, 0)
    assert (r_pred[:, 0] == o_pred[:, 0]).mean() >= 0.99  # top-1 identical (1 tie slack)
    assert (r_pred == o_pred).all(axis=1).mean() >= 0.95  # full top-5 ordering
