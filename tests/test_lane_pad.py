"""Lane padding (`enable_lane_pad`, nn/model.py): exactness golden tests.

The transform zero-pads narrow P1/P2 convs to 128 output channels inside the
traced step (attacking the dim-split wgrad layouts that made layout/copy
~55-70% of the flagship train step). It is MATHEMATICALLY exact — the real
channels compute the same function, padded slots are exact zeros — but not
bit-exact: padding C_in inserts zeros inside the conv reduction sequence,
which re-pairs the real summands in the backend's SIMD accumulation (measured
~4e-5 on fp32 CPU logits). Tests therefore assert tight tolerances of that
order, not equality; canonical params/checkpoints are untouched either way.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.nn.model import DetectionModel


def _build(model_name, pad):
    model = DetectionModel(model_name, nc=4)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    if pad:
        n = model.enable_lane_pad()
        assert n > 0
    return model, variables


@pytest.mark.smoke
@pytest.mark.parametrize("model_name", ["yolov8s-p2-repvgg-sf.yaml", "yolov8n.yaml"])
def test_lane_pad_forward_exact(model_name):
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    m0, v0 = _build(model_name, pad=False)
    m1, v1 = _build(model_name, pad=True)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), v0, v1)

    for train in (False, True):
        ctx0 = M.Ctx(train=train, dtype=jnp.float32)
        ctx1 = M.Ctx(train=train, dtype=jnp.float32)
        out0 = m0.apply(v0, x, ctx=ctx0)
        out1 = m1.apply(v1, x, ctx=ctx1)
        for a, b in zip(jax.tree_util.tree_leaves(out0), jax.tree_util.tree_leaves(out1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4)
        if train:
            assert set(ctx0.updates) == set(ctx1.updates)
            for k in ctx0.updates:
                for a, b in zip(ctx0.updates[k], ctx1.updates[k]):
                    assert a.shape == b.shape, f"BN tap {k} shape changed under lane_pad"
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5)


@pytest.mark.smoke
def test_lane_pad_gradients_exact():
    from drone_yolo_tpu.utils.loss import v8DetectionLoss

    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3), np.float32))
    batch = {
        "img": x,
        "cls": jnp.zeros((2, 8), jnp.float32),
        "bboxes": jnp.asarray(np.tile(np.array([8, 8, 40, 40], np.float32), (2, 8, 1))),
        "mask": jnp.ones((2, 8), jnp.float32),
    }

    grads = []
    for pad in (False, True):
        model, variables = _build("yolov8s-p2-repvgg-sf.yaml", pad)
        criterion = v8DetectionLoss(model)

        def loss_fn(p):
            ctx = M.Ctx(train=True, dtype=jnp.float32, targets=batch, rng=jax.random.PRNGKey(0))
            out = model.apply(p, batch["img"], ctx=ctx)
            loss, _ = criterion(out, batch)
            return loss

        grads.append(jax.grad(loss_fn)(variables))

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * scale)

    jax.tree_util.tree_map(close, grads[0], grads[1])


@pytest.mark.smoke
def test_padded_state_masters_exact():
    """pad_variables bakes the lane pads into the stored masters: the step
    computes the same function (same loss/grads as the in-step-padded form),
    padded slots receive exact-zero gradients, and unpad_variables is an
    exact inverse."""
    from drone_yolo_tpu.utils.loss import v8DetectionLoss

    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 64, 3), np.float32))
    batch = {
        "img": x,
        "cls": jnp.zeros((2, 8), jnp.float32),
        "bboxes": jnp.asarray(np.tile(np.array([8, 8, 40, 40], np.float32), (2, 8, 1))),
        "mask": jnp.ones((2, 8), jnp.float32),
    }
    model, v = _build("yolov8s-p2-repvgg-sf.yaml", pad=True)
    criterion = v8DetectionLoss(model)

    def loss_fn(p):
        ctx = M.Ctx(train=True, dtype=jnp.float32, targets=batch, rng=jax.random.PRNGKey(0))
        out = model.apply(p, batch["img"], ctx=ctx)
        loss, _ = criterion(out, batch)
        return loss

    vp = model.pad_variables(v, imgsz=64)
    # round trip is exact
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), model.unpad_variables(vp), v
    )
    # idempotent
    vp2 = model.pad_variables(vp, imgsz=64)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), vp2, vp)

    l0, g0 = jax.value_and_grad(loss_fn)(v)
    l1, g1 = jax.value_and_grad(loss_fn)(vp)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # canonical projection of padded-state grads == in-step grads (same graph
    # modulo hoisted pads; tiny reassociation noise)
    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * scale)

    jax.tree_util.tree_map(close, g0, model.unpad_variables(g1))
    # padded slots get EXACT-zero grads: zeroing them via unpad->pad changes nothing
    g1_slots_zeroed = model.pad_variables(model.unpad_variables(g1), imgsz=64)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), g1, g1_slots_zeroed)


@pytest.mark.smoke
def test_padded_state_slots_invariant_under_sgd():
    """Padded slots stay exactly zero across optimizer steps (the invariant
    that makes padded-state masters a pure schedule change)."""
    from drone_yolo_tpu.utils.loss import v8DetectionLoss
    from drone_yolo_tpu.utils.optimizer import init_momentum, label_tree, sgd_step

    x = jnp.asarray(np.random.default_rng(3).random((2, 64, 64, 3), np.float32))
    batch = {
        "img": x,
        "cls": jnp.zeros((2, 8), jnp.float32),
        "bboxes": jnp.asarray(np.tile(np.array([8, 8, 40, 40], np.float32), (2, 8, 1))),
        "mask": jnp.ones((2, 8), jnp.float32),
    }
    model, v = _build("yolov8s-p2-repvgg-sf.yaml", pad=True)
    criterion = v8DetectionLoss(model)
    params = model.pad_variables(v, imgsz=64)
    labels = label_tree(params)
    mom = init_momentum(params)

    def loss_fn(p):
        ctx = M.Ctx(train=True, dtype=jnp.float32, targets=batch, rng=jax.random.PRNGKey(0))
        out = model.apply(p, batch["img"], ctx=ctx)
        loss, _ = criterion(out, batch)
        return loss

    @jax.jit
    def step(p, m):
        g = jax.grad(loss_fn)(p)
        return sgd_step(p, g, m, labels, 0.01, 0.01, 0.937, 0.0005)

    for _ in range(3):
        params, mom = step(params, mom)
    # zeroing the padded slots changes nothing -> they are still exact zeros
    rezeroed = model.pad_variables(model.unpad_variables(params), imgsz=64)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), params, rezeroed)
    mom_rezeroed = model.pad_variables(model.unpad_variables(mom), imgsz=64)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(a, b), mom, mom_rezeroed)


def test_lane_pad_trainer_loss_matches(tmp_path):
    """2-epoch trainer run: lane_pad=True loss trajectory matches lane_pad=False."""
    import csv
    import random

    from make_dataset import make_dataset

    from drone_yolo_tpu import YOLO

    yaml_path = make_dataset(tmp_path / "d", n_train=8, n_val=4, size=96, nc=4, seed=9)
    losses = {}
    for flag in (False, True):
        random.seed(0)
        np.random.seed(0)
        m = YOLO("yolov8s-p2-repvgg-sf.yaml")
        m.train(
            data=str(yaml_path), epochs=2, imgsz=64, batch=8, workers=1,
            project=str(tmp_path), name=f"lp{int(flag)}", val=False, plots=False, verbose=False,
            warmup_epochs=0.0, seed=0, lane_pad=flag,
            mosaic=0.0, mixup=0.0, copy_paste=0.0, fliplr=0.0, flipud=0.0, hsv_h=0.0,
            hsv_s=0.0, hsv_v=0.0, translate=0.0, scale=0.0, degrees=0.0, shear=0.0,
            perspective=0.0, erasing=0.0, bgr=0.0, multi_scale=False, amp=False, nbs=8,
        )
        rows = list(csv.DictReader(open(tmp_path / f"lp{int(flag)}" / "results.csv")))
        losses[flag] = [
            float(r["train/box_loss"]) + float(r["train/cls_loss"]) + float(r["train/dfl_loss"]) for r in rows
        ]
    assert len(losses[False]) == len(losses[True]) >= 2
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-3, atol=2e-3)
