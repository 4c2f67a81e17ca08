"""Custom stride-2 conv backward (ops/conv_s2.py) vs stock XLA autodiff.

The custom VJP must be numerically equivalent (fp32: exact up to accumulation
order) for every (k, p, groups) combo the zoos use, and the full-model
gradients with the dispatch enabled must match the stock path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drone_yolo_tpu.ops.conv_s2 import conv2d_s2


def _stock(x, w, p, g):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((p, p), (p, p)),
        feature_group_count=g, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


CASES = [
    # (k, p, g, ci, co, h) — stem, backbone s2, RepVGG 1x1 branch, DWConv tap,
    # grouped, odd spatial
    (3, 1, 1, 3, 8, 16),
    (3, 1, 1, 8, 16, 20),
    (1, 0, 1, 8, 16, 16),
    (3, 1, 8, 8, 8, 16),
    (3, 1, 4, 8, 12, 14),
    (3, 1, 1, 5, 7, 15),
]


@pytest.mark.parametrize("k,p,g,ci,co,h", CASES)
def test_custom_vjp_matches_stock_fp32(k, p, g, ci, co, h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, h, ci)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, ci // g, co)) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.standard_normal(_stock(x, w, p, g).shape), jnp.float32)

    np.testing.assert_allclose(np.asarray(conv2d_s2(x, w, p, g)), np.asarray(_stock(x, w, p, g)), rtol=0, atol=0)

    gx_r, gw_r = jax.grad(lambda x, w: jnp.sum(_stock(x, w, p, g) * dy), (0, 1))(x, w)
    gx_c, gw_c = jax.grad(lambda x, w: jnp.sum(conv2d_s2(x, w, p, g) * dy), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_r), rtol=1e-4, atol=1e-4)


def test_custom_vjp_bf16_activations():
    """bf16 x / fp32 w — the training configuration. The custom wgrad
    accumulates in fp32 (vs the stock path's bf16 conv output), so compare
    against an fp32 oracle with a bf16-resolution tolerance."""
    rng = np.random.default_rng(1)
    x32 = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    dy32 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    x, dy = x32.astype(jnp.bfloat16), dy32.astype(jnp.bfloat16)

    gx_o, gw_o = jax.grad(lambda x, w: jnp.sum(_stock(x, w, 1, 1) * dy32), (0, 1))(x32, w)
    gx_c, gw_c = jax.grad(lambda x, w: jnp.sum(conv2d_s2(x, w, 1, 1) * dy.astype(jnp.float32)), (0, 1))(x, w)
    assert gx_c.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gx_c, np.float32), np.asarray(gx_o), rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_o), rtol=0.05, atol=0.15)


def test_full_model_grads_match_stock_path(monkeypatch):
    """Flagship-family model: grads with the s2 dispatch ON == stock autodiff."""
    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel
    from drone_yolo_tpu.utils.loss import v8DetectionLoss

    model = DetectionModel("yolov8n-p2-repvgg-sf.yaml", nc=2)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    crit = v8DetectionLoss(model)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    targets = {
        "cls": jnp.zeros((2, 4), jnp.float32),
        "bboxes": jnp.asarray(np.tile([8.0, 8.0, 40.0, 40.0], (2, 4, 1)), jnp.float32),
        "mask": jnp.ones((2, 4), jnp.float32),
    }

    def loss_fn(p):
        feats = model.apply(p, x, ctx=M.Ctx(train=True, dtype=jnp.float32, targets=targets))
        loss, _ = crit(feats, targets)
        return loss

    monkeypatch.setattr(M, "_S2_CUSTOM_GRAD", False)
    g_stock = jax.grad(loss_fn)(v)
    monkeypatch.setattr(M, "_S2_CUSTOM_GRAD", True)
    g_custom = jax.grad(loss_fn)(v)

    flat_s, _ = jax.tree_util.tree_flatten(g_stock)
    flat_c, _ = jax.tree_util.tree_flatten(g_custom)
    for a, b in zip(flat_s, flat_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_pallas_s2_bwd_interpret_matches_stock():
    """ops/pallas_s2bwd.py fused (dx, dw) kernel vs stock autodiff, interpret
    mode (the TPU compile path is exercised by tools/s2grad_probe.py)."""
    from drone_yolo_tpu.ops.pallas_s2bwd import HAS_PALLAS, s2_bwd

    if not HAS_PALLAS:
        pytest.skip("pallas unavailable")
    for k, p, ci, co, h, wd in [(3, 1, 8, 16, 16, 16), (3, 1, 5, 7, 12, 20), (1, 0, 8, 16, 16, 16), (3, 1, 3, 8, 8, 8)]:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, h, wd, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1, jnp.float32)
        dy = jnp.asarray(rng.standard_normal((2, h // 2, wd // 2, co)), jnp.float32)
        gx, gw = jax.grad(lambda x, w: jnp.sum(_stock(x, w, p, 1) * dy), (0, 1))(x, w)
        dx, dw = s2_bwd(x, w, dy, k=k, interpret=True)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(gx), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(gw), rtol=1e-4, atol=1e-3)
