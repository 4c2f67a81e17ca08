"""Golden numerical parity vs the torch reference (random weights, CPU).

Builds the reference DetectionModel and ours from the SAME yaml, converts the
reference's randomly-initialized weights into our pytree, and compares forward
outputs in fp32. This validates every layer's math, the graph wiring, BN-fold
fusion, and the RepVGG reparameterization end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refshim import load_reference

from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.nn.model import DetectionModel
from drone_yolo_tpu.utils.torch_convert import convert_state_dict, _conv_w, _bn

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

CFG_DIR = "/root/repo/drone_yolo_tpu/cfg/models/v8"


def _ref_model(yaml_path):
    import torch

    from ultralytics.nn.tasks import DetectionModel as RefDet

    torch.manual_seed(0)
    m = RefDet(yaml_path, verbose=False)
    m.eval()
    return m


def _ours_from_ref(yaml_path, ref_m):
    ours = DetectionModel(yaml_path)
    sd = {k: v for k, v in ref_m.state_dict().items()}
    variables = convert_state_dict(ours, sd)
    return ours, variables


@pytest.mark.parametrize(
    "name", ["v8/yolov8.yaml", "v8/yolov8-p2.yaml", "v5/yolov5.yaml", "11/yolo11.yaml"]
)
def test_forward_parity(name):
    import torch

    yaml_path = f"{CFG_DIR}/../{name}"
    ref_m = _ref_model(yaml_path)
    ours, variables = _ours_from_ref(yaml_path, ref_m)

    x = np.random.default_rng(0).random((1, 3, 64, 64), np.float32)
    with torch.no_grad():
        ref_out = ref_m(torch.from_numpy(x))[0].numpy()  # (1, 4+nc, A)

    ctx = M.Ctx(train=False, dtype=jnp.float32)
    preds, _ = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), ctx=ctx)
    ours_out = np.asarray(preds).transpose(0, 2, 1)  # (1, A, 4+nc) -> (1, 4+nc, A)

    assert ref_out.shape == ours_out.shape
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["v9/yolov9c.yaml", "v10/yolov10.yaml", "11/yolo11.yaml", "v3/yolov3.yaml", "12/yolo12.yaml"])
def test_param_count_parity(name):
    """Weight count must equal the reference's (minus its 16-element frozen DFL)."""
    import torch

    from ultralytics.nn.tasks import DetectionModel as RefDet

    yaml_path = f"{CFG_DIR}/../{name}"
    torch.manual_seed(0)
    ref_m = RefDet(yaml_path, verbose=False)
    n_ref = sum(p.numel() for p in ref_m.parameters())
    ours = DetectionModel(yaml_path)
    variables = ours.init_raw(jax.random.PRNGKey(0))
    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(variables)
    n_ours = sum(int(np.prod(x.shape)) for p, x in leaves if getattr(p[-1], "key", "") not in ("mean", "var"))
    assert n_ref - n_ours == 16, f"{name}: ref {n_ref} vs ours {n_ours}"


def test_fused_forward_parity():
    """BN-folded weights must reproduce unfused outputs (reference fuse(), tasks.py:210)."""
    yaml_path = f"{CFG_DIR}/yolov8.yaml"
    ref_m = _ref_model(yaml_path)
    ours, variables = _ours_from_ref(yaml_path, ref_m)
    fused = ours.fuse(variables)

    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3), np.float32))
    ctx = M.Ctx(train=False, dtype=jnp.float32)
    a, _ = ours.apply(variables, x, ctx=ctx)
    b, _ = ours.apply(fused, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_repvgg_block_parity():
    """Our RepVGGBlock (train & fused) vs the reference block (block.py:1393)."""
    import torch

    import ultralytics.nn.modules.block as ref_block
    from ultralytics.nn.modules.block import RepVGGBlock as RefRep

    # the reference snapshot's _fuse_bn_tensor identity path references `np`
    # without importing it (latent defect); patch it in for the golden run
    if not hasattr(ref_block, "np"):
        ref_block.np = np

    for c1, c2, s in [(8, 16, 2), (16, 16, 1)]:
        torch.manual_seed(0)
        rm = RefRep(c1, c2, 3, stride=s)
        rm.eval()
        # push BN stats off their init values so folding is non-trivial
        with torch.no_grad():
            for bn in [rm.rbr_dense.bn, rm.rbr_1x1.bn] + ([rm.rbr_identity] if rm.rbr_identity is not None else []):
                bn.running_mean.uniform_(-0.5, 0.5)
                bn.running_var.uniform_(0.5, 1.5)
                bn.eps = 1e-3  # in-model value set by reference initialize_weights (torch_utils.py)

        ours = M.RepVGGBlock(c1, c2, 3, s)
        ours.set_paths("blk")
        sd = rm.state_dict()
        v = {
            "dense": {"conv": {"kernel": _conv_w(sd["rbr_dense.conv.weight"])}, "bn": _bn(sd, "rbr_dense.bn")},
            "one": {"conv": {"kernel": _conv_w(sd["rbr_1x1.conv.weight"])}, "bn": _bn(sd, "rbr_1x1.bn")},
        }
        if ours.has_identity:
            v["idbn"] = _bn(sd, "rbr_identity")

        x = np.random.default_rng(0).random((2, c1, 16, 16), np.float32)
        with torch.no_grad():
            ref_y = rm(torch.from_numpy(x)).numpy()

        ctx = M.Ctx(train=False, dtype=jnp.float32)
        y = ours(v, jnp.asarray(x.transpose(0, 2, 3, 1)), ctx)
        np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref_y, rtol=1e-4, atol=1e-4)

        # fused == reference switch_to_deploy output
        rm.switch_to_deploy()
        with torch.no_grad():
            ref_fused = rm(torch.from_numpy(x)).numpy()
        vf = ours.fuse_vars(v)
        assert "kernel" in vf and "bias" in vf
        yf = ours(vf, jnp.asarray(x.transpose(0, 2, 3, 1)), M.Ctx(train=False, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(yf).transpose(0, 3, 1, 2), ref_fused, rtol=1e-4, atol=1e-4)


def test_train_mode_maps_parity():
    """Train-mode raw maps match the reference training path (BN batch stats)."""
    import torch

    yaml_path = f"{CFG_DIR}/yolov8.yaml"
    ref_m = _ref_model(yaml_path)
    ref_m.train()
    ours, variables = _ours_from_ref(yaml_path, ref_m)

    x = np.random.default_rng(2).random((2, 3, 64, 64), np.float32)
    with torch.no_grad():
        ref_maps = ref_m(torch.from_numpy(x))  # list of (B, no, H, W)

    ctx = M.Ctx(train=True, dtype=jnp.float32)
    maps = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), ctx=ctx)
    assert len(ctx.updates) > 0, "train-mode BN stats should be collected"
    for rm_, om in zip(ref_maps, maps):
        np.testing.assert_allclose(
            np.asarray(om).transpose(0, 3, 1, 2), rm_.numpy(), rtol=1e-3, atol=1e-3
        )


def test_head_tail_fusion_bit_exact(monkeypatch):
    """DYT_FUSE_HEAD_TAIL block-diagonal head-tail conv == separate branches
    up to fp32 accumulation order (the fused dot contracts 192 terms where the
    split form contracts 64/128, so partial-sum trees differ)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import DetectionModel

    m = DetectionModel("yolov8n.yaml", nc=4)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))

    monkeypatch.setattr(M, "_FUSE_HEAD_TAIL", "0")
    ref_eval = m.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))[0]
    ref_train = m.apply(v, x, ctx=M.Ctx(train=True, dtype=jnp.float32))
    monkeypatch.setattr(M, "_FUSE_HEAD_TAIL", "auto")
    fz_eval = m.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))[0]
    fz_train = m.apply(v, x, ctx=M.Ctx(train=True, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(fz_eval), np.asarray(ref_eval), rtol=1e-4, atol=1e-5)
    for a, b in zip(ref_train, fz_train):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
