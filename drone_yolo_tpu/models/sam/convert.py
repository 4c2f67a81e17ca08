"""SAM torch-checkpoint converter: reference state_dict -> our SAM pytrees.

Maps the reference module naming (`ultralytics/models/sam/modules/encoders.py`,
`decoders.py`, `transformer.py`; same names as the original SAM release) onto
the pytree layout of `drone_yolo_tpu.models.sam.modules`. Layout transforms:
conv OIHW->HWIO, ConvTranspose IOHW->HWIO, Linear (o,i)->(i,o). `pos_embed` is
already (1, H, W, C) in the torch checkpoint (SAM stores it channels-last).

Numerical parity vs the torch reference is asserted in tests/test_sam_parity.py.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t)


def _lin(sd, p):
    v = {"kernel": _np(sd[f"{p}.weight"]).T}
    if f"{p}.bias" in sd:
        v["bias"] = _np(sd[f"{p}.bias"])
    return v


def _ln(sd, p):
    return {"scale": _np(sd[f"{p}.weight"]), "bias": _np(sd[f"{p}.bias"])}


def _conv(sd, p, bias=True):
    v = {"kernel": np.transpose(_np(sd[f"{p}.weight"]), (2, 3, 1, 0))}
    if bias and f"{p}.bias" in sd:
        v["bias"] = _np(sd[f"{p}.bias"])
    return v


def _convT(sd, p):
    # torch (in, out, kh, kw) -> (kh, kw, out, in); consumed with
    # jax conv_transpose(transpose_kernel=True) for torch-exact orientation
    return {
        "kernel": np.transpose(_np(sd[f"{p}.weight"]), (2, 3, 1, 0)),
        "bias": _np(sd[f"{p}.bias"]),
    }


def _attn(sd, p):
    """Two-way attention (q/k/v/out projections)."""
    return {
        "q_proj": _lin(sd, f"{p}.q_proj"),
        "k_proj": _lin(sd, f"{p}.k_proj"),
        "v_proj": _lin(sd, f"{p}.v_proj"),
        "out_proj": _lin(sd, f"{p}.out_proj"),
    }


def convert_image_encoder(sd, prefix="image_encoder", depth=12):
    """SAM-1 ViT image-encoder torch state_dict slice -> variables pytree."""
    blocks = {}
    for i in range(depth):
        bp = f"{prefix}.blocks.{i}"
        attn = {
            "qkv": _lin(sd, f"{bp}.attn.qkv"),
            "proj": _lin(sd, f"{bp}.attn.proj"),
        }
        if f"{bp}.attn.rel_pos_h" in sd:
            attn["rel_pos_h"] = _np(sd[f"{bp}.attn.rel_pos_h"])
            attn["rel_pos_w"] = _np(sd[f"{bp}.attn.rel_pos_w"])
        blocks[str(i)] = {
            "norm1": _ln(sd, f"{bp}.norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{bp}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{bp}.mlp.lin1"), "lin2": _lin(sd, f"{bp}.mlp.lin2")},
        }
    return {
        "patch_embed": _conv(sd, f"{prefix}.patch_embed.proj"),
        "pos_embed": _np(sd[f"{prefix}.pos_embed"]),
        "blocks": blocks,
        "neck1": _conv(sd, f"{prefix}.neck.0", bias=False),
        "neck_ln1": _ln(sd, f"{prefix}.neck.1"),
        "neck2": _conv(sd, f"{prefix}.neck.2", bias=False),
        "neck_ln2": _ln(sd, f"{prefix}.neck.3"),
    }


def convert_prompt_encoder(sd, prefix="prompt_encoder"):
    """SAM prompt-encoder torch state_dict slice -> variables pytree."""
    return {
        "pe_gaussian": _np(sd[f"{prefix}.pe_layer.positional_encoding_gaussian_matrix"]),
        "point_embeds": np.concatenate(
            [_np(sd[f"{prefix}.point_embeddings.{i}.weight"]) for i in range(4)], axis=0
        ),
        "not_a_point": _np(sd[f"{prefix}.not_a_point_embed.weight"]),
        "no_mask": _np(sd[f"{prefix}.no_mask_embed.weight"]),
        "mask_down1": _conv(sd, f"{prefix}.mask_downscaling.0"),
        "mask_ln1": _ln(sd, f"{prefix}.mask_downscaling.1"),
        "mask_down2": _conv(sd, f"{prefix}.mask_downscaling.3"),
        "mask_ln2": _ln(sd, f"{prefix}.mask_downscaling.4"),
        "mask_down3": _conv(sd, f"{prefix}.mask_downscaling.6"),
    }


def _sam_mlp(sd, p, n=3):
    return {"layers": {str(i): _lin(sd, f"{p}.layers.{i}") for i in range(n)}}


def convert_mask_decoder(sd, prefix="mask_decoder", depth=2, num_mask_tokens=4):
    """SAM-1 mask-decoder torch state_dict slice -> variables pytree."""
    blocks = {}
    for i in range(depth):
        bp = f"{prefix}.transformer.layers.{i}"
        blocks[str(i)] = {
            "self_attn": _attn(sd, f"{bp}.self_attn"),
            "norm1": _ln(sd, f"{bp}.norm1"),
            "cross_t2i": _attn(sd, f"{bp}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{bp}.norm2"),
            "mlp": {"lin1": _lin(sd, f"{bp}.mlp.lin1"), "lin2": _lin(sd, f"{bp}.mlp.lin2")},
            "norm3": _ln(sd, f"{bp}.norm3"),
            "cross_i2t": _attn(sd, f"{bp}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{bp}.norm4"),
        }
    return {
        "iou_token": _np(sd[f"{prefix}.iou_token.weight"]),
        "mask_tokens": _np(sd[f"{prefix}.mask_tokens.weight"]),
        "blocks": blocks,
        "final_t2i": _attn(sd, f"{prefix}.transformer.final_attn_token_to_image"),
        "final_norm": _ln(sd, f"{prefix}.transformer.norm_final_attn"),
        "up1": _convT(sd, f"{prefix}.output_upscaling.0"),
        "up_ln": _ln(sd, f"{prefix}.output_upscaling.1"),
        "up2": _convT(sd, f"{prefix}.output_upscaling.3"),
        "hyper_mlps": {
            str(i): _sam_mlp(sd, f"{prefix}.output_hypernetworks_mlps.{i}") for i in range(num_mask_tokens)
        },
        "iou_head": _sam_mlp(sd, f"{prefix}.iou_prediction_head"),
    }


def convert_sam_state_dict(sd, depth=12, decoder_depth=2, num_mask_tokens=4):
    """Full SAM-1 state_dict -> SAMModel variables pytree."""
    sd = {k: v for k, v in sd.items()}
    return {
        "image_encoder": convert_image_encoder(sd, depth=depth),
        "prompt_encoder": convert_prompt_encoder(sd),
        "mask_decoder": convert_mask_decoder(sd, depth=decoder_depth, num_mask_tokens=num_mask_tokens),
    }


# ---------------------------------------------------------------------------
# SAM2
# ---------------------------------------------------------------------------
def _mlp2(sd, p):
    """Reference MLP(num_layers=2) -> our MLPBlock {lin1, lin2}."""
    return {"lin1": _lin(sd, f"{p}.layers.0"), "lin2": _lin(sd, f"{p}.layers.1")}


def convert_hiera(sd, model, prefix="image_encoder.trunk"):
    """Hiera trunk (reference encoders.py:645). pos embeds are NCHW in torch."""
    blocks = {}
    for i, blk in enumerate(model.blocks):
        bp = f"{prefix}.blocks.{i}"
        b = {
            "norm1": _ln(sd, f"{bp}.norm1"),
            "attn": {"qkv": _lin(sd, f"{bp}.attn.qkv"), "proj": _lin(sd, f"{bp}.attn.proj")},
            "norm2": _ln(sd, f"{bp}.norm2"),
            "mlp": _mlp2(sd, f"{bp}.mlp"),
        }
        if f"{bp}.proj.weight" in sd:
            b["proj"] = _lin(sd, f"{bp}.proj")
        blocks[str(i)] = b
    return {
        "patch_embed": _conv(sd, f"{prefix}.patch_embed.proj"),
        "pos_embed": np.transpose(_np(sd[f"{prefix}.pos_embed"]), (0, 2, 3, 1)),
        "pos_embed_window": np.transpose(_np(sd[f"{prefix}.pos_embed_window"]), (0, 2, 3, 1)),
        "blocks": blocks,
    }


def convert_fpn_neck(sd, n_levels=4, prefix="image_encoder.neck"):
    """FpnNeck laterals. Reference convs[j] serves level (n-1-j) — highest
    channels first; ours are indexed low-stride-first."""
    return {
        "convs": {
            str(i): _conv(sd, f"{prefix}.convs.{n_levels - 1 - i}.conv") for i in range(n_levels)
        }
    }


def convert_memory_encoder(sd, prefix="memory_encoder"):
    """SAM2 memory-encoder torch state_dict slice -> variables pytree."""
    md = {
        "layers": {str(i): _conv(sd, f"{prefix}.mask_downsampler.encoder.{3 * i}") for i in range(4)},
        "lns": {str(i): _ln(sd, f"{prefix}.mask_downsampler.encoder.{3 * i + 1}") for i in range(4)},
        "final": _conv(sd, f"{prefix}.mask_downsampler.encoder.12"),
    }
    fuser = {}
    i = 0
    while f"{prefix}.fuser.layers.{i}.dwconv.weight" in sd:
        fp = f"{prefix}.fuser.layers.{i}"
        fuser[str(i)] = {
            "dwconv": _conv(sd, f"{fp}.dwconv"),
            "norm": _ln(sd, f"{fp}.norm"),
            "pw1": _lin(sd, f"{fp}.pwconv1"),
            "pw2": _lin(sd, f"{fp}.pwconv2"),
            "gamma": _np(sd[f"{fp}.gamma"]),
        }
        i += 1
    out = {
        "mask_downsampler": md,
        "pix_feat_proj": _conv(sd, f"{prefix}.pix_feat_proj"),
        "fuser": fuser,
    }
    if f"{prefix}.out_proj.weight" in sd:
        out["out_proj"] = _conv(sd, f"{prefix}.out_proj")
    return out


def convert_memory_attention(sd, num_layers=4, prefix="memory_attention"):
    """SAM2 memory-attention torch state_dict slice -> variables pytree."""
    layers = {}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        layers[str(i)] = {
            "self_attn": _attn(sd, f"{lp}.self_attn"),
            "cross_attn": _attn(sd, f"{lp}.cross_attn_image"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
            "lin1": _lin(sd, f"{lp}.linear1"),
            "lin2": _lin(sd, f"{lp}.linear2"),
        }
    return {"layers": layers, "norm": _ln(sd, f"{prefix}.norm")}


def convert_sam2_mask_decoder(sd, prefix="sam_mask_decoder", depth=2, num_mask_tokens=4):
    """SAM2 mask-decoder torch state_dict slice -> variables pytree."""
    blocks = {}
    for i in range(depth):
        bp = f"{prefix}.transformer.layers.{i}"
        blocks[str(i)] = {
            "self_attn": _attn(sd, f"{bp}.self_attn"),
            "norm1": _ln(sd, f"{bp}.norm1"),
            "cross_t2i": _attn(sd, f"{bp}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{bp}.norm2"),
            "mlp": _mlp2(sd, f"{bp}.mlp"),  # SAM2 decoder MLP uses layers.{0,1}
            "norm3": _ln(sd, f"{bp}.norm3"),
            "cross_i2t": _attn(sd, f"{bp}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{bp}.norm4"),
        }
    return {
        "obj_score_token": _np(sd[f"{prefix}.obj_score_token.weight"]),
        "iou_token": _np(sd[f"{prefix}.iou_token.weight"]),
        "mask_tokens": _np(sd[f"{prefix}.mask_tokens.weight"]),
        "blocks": blocks,
        "final_t2i": _attn(sd, f"{prefix}.transformer.final_attn_token_to_image"),
        "final_norm": _ln(sd, f"{prefix}.transformer.norm_final_attn"),
        "up1": _convT(sd, f"{prefix}.output_upscaling.0"),
        "up_ln": _ln(sd, f"{prefix}.output_upscaling.1"),
        "up2": _convT(sd, f"{prefix}.output_upscaling.3"),
        "conv_s0": _conv(sd, f"{prefix}.conv_s0"),
        "conv_s1": _conv(sd, f"{prefix}.conv_s1"),
        "hyper_mlps": {
            str(i): _sam_mlp(sd, f"{prefix}.output_hypernetworks_mlps.{i}") for i in range(num_mask_tokens)
        },
        "iou_head": _sam_mlp(sd, f"{prefix}.iou_prediction_head"),
        "obj_score_head": _sam_mlp(sd, f"{prefix}.pred_obj_score_head"),
    }


def convert_sam2_state_dict(sd, model):
    """Full SAM2 torch state_dict -> our SAM2Model variables pytree.

    `model` is our SAM2Model (block counts / fuser depth read from it)."""
    sd = {k: v for k, v in sd.items()}
    n_layers = len(model.memory_attention.layers)
    out = {
        "image_encoder": {
            "trunk": convert_hiera(sd, model.image_encoder.trunk),
            "neck": convert_fpn_neck(sd, n_levels=len(model.image_encoder.neck.convs)),
        },
        "sam_prompt_encoder": convert_prompt_encoder(sd, prefix="sam_prompt_encoder"),
        "sam_mask_decoder": convert_sam2_mask_decoder(sd),
        "memory_attention": convert_memory_attention(sd, num_layers=n_layers),
        "memory_encoder": convert_memory_encoder(sd),
        "obj_ptr_proj": _sam_mlp(sd, "obj_ptr_proj"),
        "no_mem_embed": _np(sd["no_mem_embed"]),
        "no_mem_pos_enc": _np(sd["no_mem_pos_enc"]),
        # torch (num_maskmem, 1, 1, mem_dim) -> ours (num_maskmem, 1, mem_dim)
        "maskmem_tpos_enc": _np(sd["maskmem_tpos_enc"]).reshape(model.num_maskmem, 1, model.mem_dim),
        "no_obj_ptr": _np(sd["no_obj_ptr"]),
    }
    return out


def load_sam_checkpoint(path, variant="sam_b"):
    """Load an official SAM .pth checkpoint into a (SAMModel, variables) pair.

    Requires torch for unpickling (dev-time only; the framework itself never
    imports torch at inference time — convert once, save npz)."""
    import torch

    from drone_yolo_tpu.models.sam.model import SAM_CONFIGS, SAMModel

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and hasattr(sd["model"], "state_dict"):
        sd = sd["model"].state_dict()
    depth = SAM_CONFIGS[variant][1]
    model = SAMModel(variant)
    variables = convert_sam_state_dict(sd, depth=depth)
    return model, variables
