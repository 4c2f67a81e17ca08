"""RT-DETR end-to-end: build, tiny train, val, predict."""

import numpy as np
import pytest

from make_dataset import make_dataset, make_image_with_boxes


def test_rtdetr_train_val_predict(tmp_path):
    from drone_yolo_tpu import YOLO

    data = make_dataset(tmp_path / "set", n_train=4, n_val=2, size=96, nc=3, seed=1)
    m = YOLO("rtdetr-l.yaml")
    assert m.task == "rtdetr"
    m.train(data=str(data), epochs=1, imgsz=64, batch=2, workers=1, project=str(tmp_path), name="rt", plots=False, verbose=False, val=True, max_det=30)
    assert m.trainer.metrics is not None

    img, _ = make_image_with_boxes(np.random.default_rng(0), size=96, nc=3)
    res = m.predict(source=[img], imgsz=64, verbose=False, max_det=30)
    assert len(res) == 1


def test_greedy_assignment_valid_mask():
    import jax.numpy as jnp

    from drone_yolo_tpu.models.rtdetr.loss import greedy_assignment

    cost = jnp.asarray(np.random.default_rng(0).random((2, 10, 4)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)
    a = np.asarray(greedy_assignment(cost, mask))
    # assigned queries for valid gts are unique
    assert a[0, 0] != a[0, 1]
    assert (a >= 0).all() and (a < 10).all()
