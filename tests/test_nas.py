"""NAS wrapper (VERDICT r2 missing #7): load a local checkpoint, adapt the
NAS-style (boxes_xyxy, scores) output pair into the shared NMS stack, and
predict/val through the standard pipeline — seeded-fake strategy, since real
YOLO-NAS weights come from super-gradients which this image can't download
(the reference component is itself only a wrapper, models/nas/model.py:27)."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drone_yolo_tpu.models.nas.model import NAS, adapt_nas_pair, _NASModelShim


def test_adapt_nas_pair_roundtrip():
    """xyxy pair -> xywh+scores concat, exact (reference predict.py lines 1-2)."""
    rng = np.random.default_rng(0)
    x1y1 = rng.random((2, 8, 2)).astype(np.float32) * 100
    wh = rng.random((2, 8, 2)).astype(np.float32) * 50 + 1
    boxes = np.concatenate([x1y1, x1y1 + wh], -1)
    scores = rng.random((2, 8, 3)).astype(np.float32)
    out = np.asarray(adapt_nas_pair((jnp.asarray(boxes), jnp.asarray(scores))))
    np.testing.assert_allclose(out[..., 0:2], x1y1 + wh / 2, rtol=1e-6)
    np.testing.assert_allclose(out[..., 2:4], wh, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(out[..., 4:], scores)
    # uniform tensors pass through untouched
    t = jnp.asarray(rng.random((2, 8, 7)).astype(np.float32))
    assert adapt_nas_pair(t) is t


@pytest.fixture(scope="module")
def fake_nas_ckpt(tmp_path_factory):
    """A seeded 'NAS checkpoint': a small detect model saved as npz whose shim
    output is converted to the (boxes, scores) pair contract by the facade."""
    from drone_yolo_tpu.engine.checkpoint import save_checkpoint
    from drone_yolo_tpu.nn.model import DetectionModel

    root = tmp_path_factory.mktemp("nas")
    m = DetectionModel("yolov8n.yaml", nc=4)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    path = save_checkpoint(root / "yolo_nas_fake.npz", m, v, train_args={"task": "detect"})
    return str(path)


def test_nas_facade_loads_and_predicts(fake_nas_ckpt, tmp_path):
    import cv2

    nas = NAS(fake_nas_ckpt)
    assert isinstance(nas.model, _NASModelShim)
    assert nas.task == "detect"
    assert "predictor" in nas.task_map["detect"] and "validator" in nas.task_map["detect"]

    img = (np.random.default_rng(1).random((96, 128, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img)
    results = nas.predict(source=str(p), imgsz=64, conf=0.001, verbose=False, save=False)
    assert len(results) == 1
    r = results[0]
    assert r.boxes is not None  # pipeline produced a Results container
    if len(r.boxes):
        b = np.asarray(r.boxes.xyxy)
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()


def test_nas_rejects_yaml():
    with pytest.raises(AssertionError):
        NAS("yolov8n.yaml")
