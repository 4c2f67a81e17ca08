"""SAM2 numerical parity vs the torch reference with converted weights:
Hiera trunk + FPN image encoder, prompt encoder, SAM2 mask decoder, memory
encoder, and RoPE memory attention, using the real sam2_t architecture
(reference models/sam/build.py:68 build_sam2_t) with seeded random weights.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

from drone_yolo_tpu.models.sam.convert import convert_sam2_state_dict
from drone_yolo_tpu.models.sam.sam2_model import SAM2Model
from drone_yolo_tpu.nn.modules import Ctx

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="torch reference unavailable")

IMG = 256


def _randomize(mod, seed, std=0.05):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in mod.named_parameters():
            if "norm" in name or name.endswith("gamma"):
                continue  # keep LayerNorm scales/offsets at init for stable magnitudes
            p.copy_(torch.randn(p.shape, generator=g) * std)
    mod.eval()
    return mod


@pytest.fixture(scope="module")
def pair():
    import torch  # noqa: F401

    from ultralytics.models.sam.build import _build_sam2

    ref_m = _build_sam2(
        encoder_embed_dim=96,
        encoder_stages=[1, 2, 7, 2],
        encoder_num_heads=1,
        encoder_global_att_blocks=[5, 7, 9],
        encoder_backbone_channel_list=[768, 384, 192, 96],
        encoder_window_spatial_size=[7, 7],
        encoder_window_spec=[8, 4, 14, 7],
    )
    _randomize(ref_m, 0)
    ref_m.set_imgsz((IMG, IMG))
    # reference set_imgsz updates the prompt encoder but not this mirror field
    ref_m.sam_image_embedding_size = IMG // 16
    ours = SAM2Model("sam2_t", img_size=IMG)
    ours.set_paths("model")
    variables = convert_sam2_state_dict(dict(ref_m.state_dict()), ours)
    return ref_m, ours, variables


@pytest.fixture(scope="module")
def ctx():
    return Ctx(train=False, dtype=jnp.float32)


def test_image_encoder_parity(pair, ctx):
    import torch

    ref_m, ours, v = pair
    x = np.random.default_rng(0).standard_normal((1, 3, IMG, IMG)).astype(np.float32) * 0.5
    with torch.no_grad():
        out_t = ref_m.forward_image(torch.from_numpy(x))
    feats = ours.forward_image(v, jnp.asarray(x.transpose(0, 2, 3, 1)), ctx)
    f16_t = out_t["backbone_fpn"][-1].detach().numpy()
    np.testing.assert_allclose(
        np.asarray(feats["feat_s16"]).transpose(0, 3, 1, 2), f16_t, atol=2e-3, rtol=1e-2
    )
    # high-res skips are pre-projected by conv_s0/s1 in forward_image on both sides
    np.testing.assert_allclose(
        np.asarray(feats["hr0"]).transpose(0, 3, 1, 2), out_t["backbone_fpn"][0].detach().numpy(),
        atol=2e-3, rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(feats["hr1"]).transpose(0, 3, 1, 2), out_t["backbone_fpn"][1].detach().numpy(),
        atol=2e-3, rtol=1e-2,
    )


def test_sam_heads_parity(pair, ctx):
    import torch

    ref_m, ours, v = pair
    g = IMG // 16
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, 256, g, g)).astype(np.float32) * 0.1
    hr0 = rng.standard_normal((1, 32, 4 * g, 4 * g)).astype(np.float32) * 0.1
    hr1 = rng.standard_normal((1, 64, 2 * g, 2 * g)).astype(np.float32) * 0.1
    pts = np.array([[[40.0, 60.0]]], np.float32)
    lbl = np.array([[1]], np.int32)
    with torch.no_grad():
        (
            low_res_multimasks, _, ious_t, _, _, obj_ptr_t, obj_logits_t,
        ) = ref_m._forward_sam_heads(
            backbone_features=torch.from_numpy(pix),
            point_inputs={"point_coords": torch.from_numpy(pts), "point_labels": torch.from_numpy(lbl)},
            high_res_features=[torch.from_numpy(hr0), torch.from_numpy(hr1)],
            multimask_output=True,
        )
    masks, ious, best, obj_ptr, obj_logits = ours.forward_sam_heads(
        v,
        jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(pts),
        jnp.asarray(lbl),
        [jnp.asarray(hr0.transpose(0, 2, 3, 1)), jnp.asarray(hr1.transpose(0, 2, 3, 1))],
        ctx,
        multimask=True,
    )
    np.testing.assert_allclose(np.asarray(ious), ious_t.detach().numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(masks), low_res_multimasks.detach().numpy(), atol=5e-3, rtol=1e-2
    )
    np.testing.assert_allclose(np.asarray(obj_ptr), obj_ptr_t.detach().numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(obj_logits).reshape(-1), obj_logits_t.detach().numpy().reshape(-1), atol=2e-3, rtol=1e-2
    )


def test_memory_encoder_parity(pair, ctx):
    import torch

    ref_m, ours, v = pair
    g = IMG // 16
    rng = np.random.default_rng(2)
    pix = rng.standard_normal((1, 256, g, g)).astype(np.float32) * 0.1
    mask_logits = rng.standard_normal((1, 1, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        out_t = ref_m.memory_encoder(torch.from_numpy(pix), torch.sigmoid(torch.from_numpy(mask_logits)), skip_mask_sigmoid=True)
    m_sig = 1.0 / (1.0 + np.exp(-mask_logits))
    mem, pos = ours.memory_encoder(
        v["memory_encoder"], jnp.asarray(pix.transpose(0, 2, 3, 1)), jnp.asarray(m_sig.transpose(0, 2, 3, 1)), ctx
    )
    np.testing.assert_allclose(
        np.asarray(mem).transpose(0, 3, 1, 2), out_t["vision_features"].detach().numpy(), atol=2e-3, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(pos).transpose(2, 0, 1), out_t["vision_pos_enc"][0][0].detach().numpy(), atol=1e-4
    )


def test_memory_attention_parity(pair, ctx):
    import torch

    ref_m, ours, v = pair
    h = w = 8
    rng = np.random.default_rng(3)
    cur = rng.standard_normal((h * w, 1, 256)).astype(np.float32) * 0.1
    cur_pos = rng.standard_normal((h * w, 1, 256)).astype(np.float32) * 0.1
    mem = rng.standard_normal((2 * h * w, 1, 64)).astype(np.float32) * 0.1
    mem_pos = rng.standard_normal((2 * h * w, 1, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        out_t = ref_m.memory_attention(
            curr=torch.from_numpy(cur), memory=torch.from_numpy(mem),
            curr_pos=torch.from_numpy(cur_pos), memory_pos=torch.from_numpy(mem_pos),
            num_obj_ptr_tokens=0,
        )
    out = ours.memory_attention(
        v["memory_attention"],
        jnp.asarray(cur.transpose(1, 0, 2)),
        jnp.asarray(mem.transpose(1, 0, 2)),
        jnp.asarray(cur_pos.transpose(1, 0, 2)),
        jnp.asarray(mem_pos.transpose(1, 0, 2)),
        (h, w),
        ctx,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(1, 0, 2), out_t.detach().numpy(), atol=2e-3, rtol=1e-2
    )
