"""Space-to-depth stem reformulation (modules.SPDConv): golden equivalence.

Like the RepVGG fusion golden test, this proves the transform is numerically
exact — same outputs AND same parameter gradients as the plain stride-2 3x3
stem conv — so enabling it never moves mAP, only the TPU compute schedule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drone_yolo_tpu.nn import modules as M


@pytest.mark.parametrize("size,cin,cout", [(64, 3, 16), (32, 3, 8), (64, 4, 8)])
def test_spd_forward_equivalence(size, cin, cout):
    conv = M.Conv(cin, cout, 3, 2)
    conv.set_paths("stem")
    v = conv.init(jax.random.PRNGKey(0))
    spd = M.SPDConv(conv)
    x = jnp.asarray(np.random.default_rng(0).random((2, size, size, cin), np.float32))
    ctx = M.Ctx(train=False, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(spd(v, x, ctx)), np.asarray(conv(v, x, ctx)), rtol=1e-5, atol=1e-5)


def test_spd_gradient_equivalence():
    """Same parameterization -> identical gradients for the original 3x3 kernel."""
    conv = M.Conv(3, 16, 3, 2)
    conv.set_paths("stem")
    v = conv.init(jax.random.PRNGKey(1))
    spd = M.SPDConv(conv)
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3), np.float32))

    def loss(mod, vv):
        return jnp.sum(mod(vv, x, M.Ctx(train=True, dtype=jnp.float32)) ** 2)

    g_ref = jax.grad(lambda vv: loss(conv, vv))(v)
    g_spd = jax.grad(lambda vv: loss(spd, vv))(v)
    # mathematically identical; tolerance covers fp32 accumulation-order
    # differences in the reformulated conv backward (observed <=1.2e-3 rel)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=1e-3), g_ref, g_spd
    )


def test_spd_fused_and_model_level():
    """enable_spd_stem on a real model: identical eval predictions, fused too."""
    from drone_yolo_tpu.nn.model import DetectionModel

    m = DetectionModel("yolov8n.yaml", nc=4)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3), np.float32))
    base, _ = m.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    assert m.enable_spd_stem()
    assert m.enable_spd_stem()  # idempotent
    after, _ = m.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(after), np.asarray(base), rtol=1e-5, atol=1e-5)
    fused = m.fuse(v)
    after_f, _ = m.apply(fused, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(after_f), np.asarray(base), rtol=1e-4, atol=1e-4)


def test_spd_stride2_full_model():
    """enable_spd_stride2 on the flagship: all 11 top-level k3 s2 convs
    (stem, 4 stride-2 RepVGG blocks incl. both branches, 3 grouped DWConv
    sandwich taps, 3 head downsamples) execute in SPD form with train/eval/
    fused outputs matching the plain schedule."""
    from drone_yolo_tpu.nn.model import DetectionModel

    m1 = DetectionModel("yolov8s-p2-repvgg-sf.yaml", nc=4)
    v = m1.init(jax.random.PRNGKey(0), imgsz=64)
    m2 = DetectionModel("yolov8s-p2-repvgg-sf.yaml", nc=4)
    assert m2.enable_spd_stride2() == 11
    assert m2.enable_spd_stride2() == 11  # idempotent

    x = jnp.asarray(np.random.default_rng(3).random((2, 64, 64, 3), np.float32))
    ev1, _ = m1.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    ev2, _ = m2.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(ev2), np.asarray(ev1), rtol=1e-4, atol=1e-4)

    # train-mode (batch-stat BN) feature maps; unit-variance normalization at
    # random init amplifies fp reassociation noise, hence the looser band
    t1 = m1.apply(v, x, ctx=M.Ctx(train=True, dtype=jnp.float32, rng=jax.random.PRNGKey(0)))
    t2 = m2.apply(v, x, ctx=M.Ctx(train=True, dtype=jnp.float32, rng=jax.random.PRNGKey(0)))
    for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3)

    fused = m1.fuse(v)  # fused RepVGG deploy kernels through the SPD path
    f1, _ = m1.apply(fused, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    f2, _ = m2.apply(fused, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=1e-4, atol=1e-4)
