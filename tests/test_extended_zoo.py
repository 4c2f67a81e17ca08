"""Extended module zoo (round 2): parameter-count parity vs the reference for
Conv2/ConvTranspose/GhostBottleneck/C3x/C3TR/C3Ghost/BottleneckCSP/ResNetLayer/
C2fPSA/TransformerBlock, plus a graph-builder forward smoke over them."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refshim import load_reference

from drone_yolo_tpu.nn import modules as M
from drone_yolo_tpu.nn.modules import Ctx

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")


def _params(mod):
    v = mod.init(jax.random.PRNGKey(0))
    # exclude BN running stats (not torch Parameters)
    from jax.tree_util import tree_flatten_with_path, keystr

    flat, _ = tree_flatten_with_path(v)
    return sum(int(np.prod(x.shape)) for p, x in flat if "mean" not in keystr(p) and "var" not in keystr(p))


def _ref_params(mod):
    return sum(p.numel() for p in mod.parameters())


CASES = [
    ("Conv2", lambda M_: M_.Conv2(32, 64, 3, 2), lambda R: R.Conv2(32, 64, 3, 2)),
    ("ConvTranspose", lambda M_: M_.ConvTranspose(32, 16, 2, 2), lambda R: R.ConvTranspose(32, 16, 2, 2)),
    ("GhostBottleneck", lambda M_: M_.GhostBottleneck(32, 32, 3, 1), lambda R: R.GhostBottleneck(32, 32, 3, 1)),
    ("GhostBottleneck_s2", lambda M_: M_.GhostBottleneck(32, 48, 3, 2), lambda R: R.GhostBottleneck(32, 48, 3, 2)),
    ("C3x", lambda M_: M_.C3x(32, 32, n=2), lambda R: R.C3x(32, 32, n=2)),
    ("C3TR", lambda M_: M_.C3TR(32, 32, n=2), lambda R: R.C3TR(32, 32, n=2)),
    ("C3Ghost", lambda M_: M_.C3Ghost(32, 32, n=2), lambda R: R.C3Ghost(32, 32, n=2)),
    ("BottleneckCSP", lambda M_: M_.BottleneckCSP(32, 64, n=2), lambda R: R.BottleneckCSP(32, 64, n=2)),
    ("ResNetLayer_first", lambda M_: M_.ResNetLayer(3, 32, 1, True, 1), lambda R: R.ResNetLayer(3, 32, 1, True, 1)),
    ("ResNetLayer", lambda M_: M_.ResNetLayer(128, 32, 2, False, 2), lambda R: R.ResNetLayer(128, 32, 2, False, 2)),
    ("C2fPSA", lambda M_: M_.C2fPSA(128, 128, n=1), lambda R: R.C2fPSA(128, 128, n=1)),
    ("TransformerBlock", lambda M_: M_.TransformerBlock(32, 32, 4, 2), lambda R: R.TransformerBlock(32, 32, 4, 2)),
]


@pytest.mark.parametrize("name,ours_fn,ref_fn", CASES, ids=[c[0] for c in CASES])
def test_param_count_parity(name, ours_fn, ref_fn):
    import ultralytics.nn.modules as R

    ours = ours_fn(M)
    ours.set_paths("m")
    theirs = ref_fn(R)
    assert _params(ours) == _ref_params(theirs), name


@pytest.mark.parametrize("name,ours_fn,ref_fn", CASES, ids=[c[0] for c in CASES])
def test_forward_shape_and_finite(name, ours_fn, ref_fn):
    import torch

    import ultralytics.nn.modules as R

    ours = ours_fn(M)
    ours.set_paths("m")
    v = ours.init(jax.random.PRNGKey(0))
    c1 = 3 if "first" in name else (128 if name == "ResNetLayer" else (128 if "C2fPSA" in name else 32))
    x = np.random.default_rng(0).standard_normal((1, 32, 32, c1)).astype(np.float32) * 0.1
    y = ours(v, jnp.asarray(x), Ctx(train=False, dtype=jnp.float32))
    with torch.no_grad():
        theirs = ref_fn(R).eval()
        yt = theirs(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert tuple(np.asarray(y).transpose(0, 3, 1, 2).shape) == tuple(yt.shape), name
    assert np.isfinite(np.asarray(y)).all()


def test_builder_smoke_extended_modules(tmp_path):
    """A yaml using the new blocks parses, scales, and runs."""
    yaml_text = """
nc: 4
scales:
  n: [0.5, 0.5, 1024]
backbone:
  - [-1, 1, Conv2, [32, 3, 2]]
  - [-1, 1, GhostBottleneck, [64, 3, 2]]
  - [-1, 2, C3Ghost, [64]]
  - [-1, 1, Conv, [128, 3, 2]]
  - [-1, 2, C3x, [128]]
  - [-1, 1, Conv, [256, 3, 2]]
  - [-1, 2, BottleneckCSP, [256]]
  - [-1, 1, SPPF, [256, 5]]
head:
  - [-1, 1, ConvTranspose, [128, 2, 2]]
  - [[-1, 4], 1, Concat, [1]]
  - [-1, 2, C2f, [128]]
  - [[-1, 7], 1, Detect, [nc]]
"""
    p = tmp_path / "ext.yaml"
    p.write_text(yaml_text)
    from drone_yolo_tpu.nn.model import DetectionModel

    m = DetectionModel(str(p))
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    from drone_yolo_tpu.nn import modules as M_

    preds, _ = m.apply(v, jnp.zeros((1, 64, 64, 3), jnp.float32), ctx=M_.Ctx(train=False, dtype=jnp.float32))
    assert preds.shape[-1] == 4 + 4
    assert np.isfinite(np.asarray(preds)).all()
