"""Tiny end-to-end runs for segment / pose / classify / obb tasks.

Synthetic datasets per task; one epoch at small imgsz; asserts finite losses,
metric computation, and predict round-trips. Mirrors the reference CI style.
"""

from pathlib import Path

import numpy as np
import pytest

from make_dataset import PALETTE


def _make_seg_dataset(root, n_train=4, n_val=2, size=96, nc=2, seed=0):
    """Rectangles as 4-point polygons (seg labels: cls x1 y1 x2 y2 x3 y3 x4 y4)."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            lines = []
            for _ in range(rng.integers(1, 3)):
                cls = int(rng.integers(0, nc))
                w, h = int(rng.integers(size // 6, size // 3)), int(rng.integers(size // 6, size // 3))
                x1, y1 = int(rng.integers(0, size - w)), int(rng.integers(0, size - h))
                img[y1 : y1 + h, x1 : x1 + w] = PALETTE[cls]
                pts = [(x1, y1), (x1 + w, y1), (x1 + w, y1 + h), (x1, y1 + h)]
                coords = " ".join(f"{px / size:.6f} {py / size:.6f}" for px, py in pts)
                lines.append(f"{cls} {coords}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines) + "\n")
    names = "\n".join(f"  {i}: c{i}" for i in range(nc))
    y = root / "data.yaml"
    y.write_text(f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nnames:\n{names}\n")
    return y


def _make_pose_dataset(root, n_train=4, n_val=2, size=96, seed=0, nk=4):
    """Boxes with nk keypoints at corners (pose labels: cls xywh + nk*(x y v))."""
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            lines = []
            for _ in range(rng.integers(1, 3)):
                w, h = int(rng.integers(size // 5, size // 3)), int(rng.integers(size // 5, size // 3))
                x1, y1 = int(rng.integers(0, size - w)), int(rng.integers(0, size - h))
                img[y1 : y1 + h, x1 : x1 + w] = PALETTE[0]
                cx, cy = (x1 + w / 2) / size, (y1 + h / 2) / size
                corners = [(x1, y1), (x1 + w, y1), (x1 + w, y1 + h), (x1, y1 + h)][:nk]
                kp = " ".join(f"{px / size:.5f} {py / size:.5f} 2" for px, py in corners)
                lines.append(f"0 {cx:.5f} {cy:.5f} {w / size:.5f} {h / size:.5f} {kp}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img[:, :, ::-1])
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines) + "\n")
    y = root / "data.yaml"
    y.write_text(
        f"path: {root.resolve()}\ntrain: images/train\nval: images/val\nkpt_shape: [{nk}, 3]\n"
        f"flip_idx: [1, 0, 3, 2]\nnames:\n  0: person\n"
    )
    return y


def _make_cls_dataset(root, size=64, n_per=3, seed=0):
    import cv2

    root = Path(root)
    rng = np.random.default_rng(seed)
    for split in ("train", "val"):
        for c in range(2):
            d = root / split / f"class{c}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_per):
                img = np.full((size, size, 3), PALETTE[c], np.uint8)
                img = (img * (0.7 + 0.3 * rng.random((size, size, 3)))).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return root


def test_segment_train_val_predict(tmp_path):
    from drone_yolo_tpu import YOLO

    data = _make_seg_dataset(tmp_path / "segset")
    m = YOLO("yolov8n-seg.yaml")
    m.train(data=str(data), epochs=1, imgsz=64, batch=2, workers=1, project=str(tmp_path), name="seg", plots=False, verbose=False, val=True)
    assert m.trainer.metrics is not None and "metrics/mAP50(M)" in m.trainer.metrics
    import cv2

    img = cv2.imread(str(next((tmp_path / "segset" / "images" / "val").glob("*.jpg"))))
    res = m.predict(source=[img], imgsz=64, verbose=False)
    assert len(res) == 1  # masks may be None with random weights


def test_pose_train_val_predict(tmp_path):
    from drone_yolo_tpu import YOLO

    data = _make_pose_dataset(tmp_path / "poseset")
    m = YOLO("yolov8n-pose.yaml")
    m.train(data=str(data), epochs=1, imgsz=64, batch=2, workers=1, project=str(tmp_path), name="pose", plots=False, verbose=False, val=True)
    assert m.trainer.metrics is not None and "metrics/mAP50(P)" in m.trainer.metrics
    assert m.model.head.kpt_shape == (4, 3)


def test_classify_train_val_predict(tmp_path):
    from drone_yolo_tpu import YOLO

    root = _make_cls_dataset(tmp_path / "clsset")
    m = YOLO("yolov8n-cls.yaml")
    m.train(data=str(root), epochs=2, imgsz=32, batch=4, workers=1, project=str(tmp_path), name="cls", plots=False, verbose=False, val=True)
    assert m.trainer.metrics is not None and "metrics/accuracy_top1" in m.trainer.metrics
    import cv2

    img = cv2.imread(str(next((root / "val" / "class0").glob("*.jpg"))))
    res = m.predict(source=[img], imgsz=32, verbose=False)
    assert res[0].probs is not None
    assert 0 <= res[0].probs.top1 < 2


def test_obb_loss_and_predict(tmp_path):
    """OBB: loss step on synthetic rboxes + predict postprocess round-trip."""
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import OBBModel
    from drone_yolo_tpu.utils.loss import v8OBBLoss

    model = OBBModel("yolov8n-obb.yaml", nc=3)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    crit = v8OBBLoss(model)
    x = jnp.zeros((1, 64, 64, 3))
    out = model.apply(v, x, ctx=M.Ctx(train=True, dtype=jnp.float32))
    targets = {
        "cls": jnp.zeros((1, 4)),
        "rboxes": jnp.asarray([[[32, 32, 20, 10, 0.3], [10, 12, 8, 6, -0.2], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0]]], jnp.float32),
        "mask": jnp.asarray([[1, 1, 0, 0]], jnp.float32),
    }
    loss, items = crit(out, targets)
    assert np.isfinite(float(loss))

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n-obb.yaml")
    img = (np.random.default_rng(0).random((96, 96, 3)) * 255).astype(np.uint8)
    res = m.predict(source=[img], imgsz=64, verbose=False)
    assert len(res) == 1
