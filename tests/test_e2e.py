"""End-to-end slice tests: predict on files, tiny training run, val metrics.

Mirrors the reference CI strategy (SURVEY.md §4): nano model, tiny images,
synthetic coco8-style data, everything CPU-runnable.
"""

import numpy as np
import pytest

from make_dataset import make_dataset, make_image_with_boxes


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyset")
    return make_dataset(root, n_train=8, n_val=4, size=160, nc=4, seed=0)


def test_predict_files(tmp_path):
    import cv2

    from drone_yolo_tpu import YOLO

    rng = np.random.default_rng(0)
    img, _ = make_image_with_boxes(rng, size=160)
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img[:, :, ::-1])

    m = YOLO("yolov8n.yaml")
    results = m.predict(source=str(p), imgsz=64, save=False, verbose=False)
    assert len(results) == 1
    r = results[0]
    assert r.orig_shape == (160, 160)
    assert r.speed["inference"] is not None
    # random weights: no real detections expected, but the container must work
    _ = r.to_json()
    _ = r.plot()


def test_predict_numpy_batch():
    from drone_yolo_tpu import YOLO

    rng = np.random.default_rng(1)
    imgs = [make_image_with_boxes(rng, size=96)[0] for _ in range(2)]
    m = YOLO("yolov8n.yaml")
    results = m.predict(source=imgs, imgsz=64, verbose=False)
    assert len(results) == 2


def test_train_tiny(tiny_data, tmp_path):
    """One epoch on synthetic data: loss finite, checkpoints written, val runs."""
    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    m.train(
        data=str(tiny_data),
        epochs=2,
        imgsz=64,
        batch=4,
        workers=1,
        project=str(tmp_path),
        name="exp",
        val=True,
        plots=False,
        verbose=False,
        warmup_epochs=0.5,
        patience=5,
    )
    wdir = tmp_path / "exp" / "weights"
    assert (wdir / "last.npz").exists()
    assert (tmp_path / "exp" / "results.csv").exists()
    assert m.trainer.metrics is not None

    # reload the checkpoint through the facade and predict with it
    m2 = YOLO(str(wdir / "last.npz"))
    assert m2.model.nc == 4
    rng = np.random.default_rng(2)
    img, _ = make_image_with_boxes(rng, size=96)
    res = m2.predict(source=[img], imgsz=64, verbose=False)
    assert len(res) == 1


def test_train_flagship_topology(tiny_data, tmp_path):
    """Drone-YOLO topology end-to-end (VERDICT r2 weak #6): P2 4-level head,
    RepVGG stride-2 backbone, sandwich-fusion neck — train + val + predict.
    n-scale keeps it CPU-affordable; the head/assigner/NMS shapes (4 levels,
    strides [4,8,16,32]) are identical to the s-scale flagship."""
    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n-p2-repvgg-sf.yaml")
    assert len(m.model.stride) == 4 and int(m.model.stride[0]) == 4
    m.train(
        data=str(tiny_data),
        epochs=1,
        imgsz=64,
        batch=4,
        workers=1,
        project=str(tmp_path),
        name="flag",
        val=True,
        plots=False,
        verbose=False,
        warmup_epochs=0.0,
        patience=5,
    )
    wdir = tmp_path / "flag" / "weights"
    assert (wdir / "last.npz").exists()
    assert m.trainer.metrics is not None

    # reload, fuse (RepVGG branch collapse), and predict through the facade
    m2 = YOLO(str(wdir / "last.npz"))
    rng = np.random.default_rng(3)
    img, _ = make_image_with_boxes(rng, size=96)
    res = m2.predict(source=[img], imgsz=64, verbose=False)
    assert len(res) == 1


def test_overfit_single_image(tiny_data, tmp_path):
    """Loss must decrease substantially when overfitting one batch — catches
    gradient/optimizer sign errors that parity tests on a single step cannot."""
    import jax
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.loss import v8DetectionLoss
    from drone_yolo_tpu.utils.optimizer import init_momentum, label_tree, sgd_step

    model = DetectionModel("yolov8n.yaml", nc=4)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    crit = v8DetectionLoss(model)

    rng = np.random.default_rng(0)
    img, labels = make_image_with_boxes(rng, size=64, n_min=2, n_max=2, nc=4)
    x = jnp.asarray(img[None].astype(np.float32) / 255.0)
    cls = np.zeros((1, 8), np.float32)
    box = np.zeros((1, 8, 4), np.float32)
    mask = np.zeros((1, 8), np.float32)
    for i, (c, cx, cy, w, h) in enumerate(labels):
        cls[0, i] = c
        box[0, i] = [(cx - w / 2) * 64, (cy - h / 2) * 64, (cx + w / 2) * 64, (cy + h / 2) * 64]
        mask[0, i] = 1.0
    targets = {"cls": jnp.asarray(cls), "bboxes": jnp.asarray(box), "mask": jnp.asarray(mask)}

    labels_tree = label_tree(v)
    mom = init_momentum(v)

    @jax.jit
    def step(v, mom):
        def loss_fn(params):
            feats = model.apply(params, x, ctx=M.Ctx(train=True, dtype=jnp.float32))
            loss, items = crit(feats, targets)
            return loss, items

        (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(v)
        v2, mom2 = sgd_step(v, grads, mom, labels_tree, jnp.float32(0.01), jnp.float32(0.01), jnp.float32(0.9), jnp.float32(0.0))
        return v2, mom2, loss

    first = None
    for i in range(30):
        v, mom, loss = step(v, mom)
        if first is None:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(last)
    assert last < first * 0.7, f"loss did not decrease: {first} -> {last}"
