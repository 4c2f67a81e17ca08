"""SAM building blocks: ViT image encoder, prompt encoder, two-way mask decoder.

Capability parity with `ultralytics/models/sam/modules/{encoders,decoders,
transformer}.py` (SAM-1 image model): patch-embed ViT with windowed attention
and decomposed relative position embeddings, random-Fourier point/box/mask
prompt encoder, and the two-way transformer mask decoder with IoU prediction.
Functional pytrees like the rest of the framework; NHWC throughout.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.nn.modules import Conv2dRaw, Ctx, Module, _child_key
from drone_yolo_tpu.nn.transformer import LayerNorm, Linear


class LayerNorm2d(Module):
    """Channel layernorm over NHWC maps (reference sam LayerNorm2d)."""

    def __init__(self, c):
        self.c = c

    def init(self, key):
        return {"scale": jnp.ones((self.c,), jnp.float32), "bias": jnp.zeros((self.c,), jnp.float32)}

    def __call__(self, v, x, ctx: Ctx):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        return (xf - mu) / jnp.sqrt(var + 1e-6) * v["scale"] + v["bias"]


class MLPBlock(Module):
    def __init__(self, dim, mlp_dim, act="gelu"):
        self.lin1 = Linear(dim, mlp_dim)
        self.lin2 = Linear(mlp_dim, dim)
        self.act = act

    def __call__(self, v, x, ctx: Ctx):
        y = self.lin1(v["lin1"], x, ctx)
        y = jax.nn.relu(y) if self.act == "relu" else jax.nn.gelu(y, approximate=False)
        return self.lin2(v["lin2"], y, ctx)


def _rel_pos_embed(q_size, k_size, rel_pos):
    """Interpolated relative position table lookup (reference get_rel_pos)."""
    max_rel = 2 * max(q_size, k_size) - 1
    # rel_pos: (L, head_dim); assume table already sized
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]  # (q, k, head_dim)


class ViTAttention(Module):
    """Multi-head attention with decomposed relative positions (reference sam
    encoders.Attention)."""

    def __init__(self, dim, num_heads=8, use_rel_pos=True, input_size=(14, 14)):
        self.dim, self.nh = dim, num_heads
        self.hd = dim // num_heads
        self.use_rel_pos = use_rel_pos
        self.input_size = input_size
        self.qkv = Linear(dim, dim * 3)
        self.proj = Linear(dim, dim)

    def init(self, key):
        v = super().init(key)
        if self.use_rel_pos:
            h, w = self.input_size
            v["rel_pos_h"] = jnp.zeros((2 * h - 1, self.hd), jnp.float32)
            v["rel_pos_w"] = jnp.zeros((2 * w - 1, self.hd), jnp.float32)
        return v

    def __call__(self, v, x, ctx: Ctx):
        b, h, w, _ = x.shape
        n = h * w
        qkv = self.qkv(v["qkv"], x.reshape(b, n, self.dim), ctx).reshape(b, n, 3, self.nh, self.hd)
        q, k, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (self.hd**-0.5)
        if self.use_rel_pos:
            rh = _rel_pos_embed(h, h, v["rel_pos_h"])  # (h, h, hd)
            rw = _rel_pos_embed(w, w, v["rel_pos_w"])
            qr = q.reshape(b, h, w, self.nh, self.hd)
            rel_h = jnp.einsum("bhwnc,hkc->bnhwk", qr, rh)  # (B, nh, h, w, h_k)
            rel_w = jnp.einsum("bhwnc,wkc->bnhwk", qr, rw)
            attn = attn.reshape(b, self.nh, h, w, h, w) + rel_h[..., :, None] + rel_w[..., None, :]
            attn = attn.reshape(b, self.nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vv).reshape(b, n, self.dim)
        return self.proj(v["proj"], out, ctx).reshape(b, h, w, self.dim)


def window_partition(x, window):
    """(B, H, W, C) -> (B*nW, window, window, C) with bottom/right padding; returns (windows, padded_hw)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x, window, pad_hw, hw):
    """Inverse of window_partition: reassemble windows and strip padding back to (B, H, W, C)."""
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // window * wp // window)
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTBlock(Module):
    """Transformer block with optional windowed attention (reference sam Block)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, window=0, input_size=(64, 64)):
        self.window = window
        attn_size = (window, window) if window else input_size
        self.norm1 = LayerNorm(dim)
        self.attn = ViTAttention(dim, num_heads, use_rel_pos=True, input_size=attn_size)
        self.norm2 = LayerNorm(dim)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio))

    def __call__(self, v, x, ctx: Ctx):
        shortcut = x
        y = self.norm1(v["norm1"], x, ctx)
        if self.window:
            hw = y.shape[1:3]
            y, pad_hw = window_partition(y, self.window)
            y = self.attn(v["attn"], y, ctx)
            y = window_unpartition(y, self.window, pad_hw, hw)
        else:
            y = self.attn(v["attn"], y, ctx)
        x = shortcut + y
        return x + self.mlp(v["mlp"], self.norm2(v["norm2"], x, ctx), ctx)


class ImageEncoderViT(Module):
    """SAM ViT image encoder (reference encoders.ImageEncoderViT).

    SAM-B config: 12 layers, dim 768, 12 heads, window 14, global attention at
    layers (2, 5, 8, 11); 1024px input -> (64, 64, 256) embedding.
    """

    def __init__(self, img_size=1024, patch=16, dim=768, depth=12, num_heads=12, window=14, global_idx=(2, 5, 8, 11), out_chans=256):
        self.img_size, self.patch, self.dim = img_size, patch, dim
        self.grid = img_size // patch
        self.patch_embed = Conv2dRaw(3, dim, patch, patch, p=0, bias=True)
        self.blocks = [
            ViTBlock(dim, num_heads, window=0 if i in global_idx else window, input_size=(self.grid, self.grid))
            for i in range(depth)
        ]
        self.neck1 = Conv2dRaw(dim, out_chans, 1, bias=False)
        self.neck_ln1 = LayerNorm2d(out_chans)
        self.neck2 = Conv2dRaw(out_chans, out_chans, 3, p=1, bias=False)
        self.neck_ln2 = LayerNorm2d(out_chans)

    def init(self, key):
        v = super().init(key)
        v["pos_embed"] = jnp.zeros((1, self.grid, self.grid, self.dim), jnp.float32)
        return v

    def __call__(self, v, x, ctx: Ctx):
        y = self.patch_embed(v["patch_embed"], x, ctx)
        pe = v["pos_embed"]
        if pe.shape[1:3] != y.shape[1:3]:
            # checkpoint table is 1024-native; nearest-resize to the actual grid
            # (reference encoders.py:132 F.interpolate, mode=nearest)
            pe = jax.image.resize(pe, (1, y.shape[1], y.shape[2], pe.shape[3]), method="nearest")
        y = y + pe.astype(y.dtype)
        for i, blk in enumerate(self.blocks):
            y = blk(v["blocks"][str(i)], y, ctx)
        y = self.neck1(v["neck1"], y, ctx)
        y = self.neck_ln1(v["neck_ln1"], y, ctx)
        y = self.neck2(v["neck2"], y.astype(ctx.dtype), ctx)
        return self.neck_ln2(v["neck_ln2"], y, ctx)


class PromptEncoder(Module):
    """Point/box/mask prompt encoder (reference encoders.PromptEncoder)."""

    def __init__(self, embed_dim=256, image_embedding_size=(64, 64), input_image_size=(1024, 1024), mask_in_chans=16):
        self.dim = embed_dim
        self.embed_size = image_embedding_size
        self.input_size = input_image_size
        # 4 point types: neg, pos, box-corner-1, box-corner-2 + not-a-point
        self.n_point_embeds = 4
        self.mask_down1 = Conv2dRaw(1, mask_in_chans // 4, 2, 2, p=0, bias=True)
        self.mask_ln1 = LayerNorm2d(mask_in_chans // 4)
        self.mask_down2 = Conv2dRaw(mask_in_chans // 4, mask_in_chans, 2, 2, p=0, bias=True)
        self.mask_ln2 = LayerNorm2d(mask_in_chans)
        self.mask_down3 = Conv2dRaw(mask_in_chans, embed_dim, 1, bias=True)

    def init(self, key):
        v = super().init(key)
        v["pe_gaussian"] = jax.random.normal(_child_key(key, "pe"), (2, self.dim // 2), jnp.float32)
        v["point_embeds"] = jax.random.normal(_child_key(key, "pts"), (self.n_point_embeds, self.dim), jnp.float32)
        v["not_a_point"] = jax.random.normal(_child_key(key, "nap"), (1, self.dim), jnp.float32)
        v["no_mask"] = jax.random.normal(_child_key(key, "nm"), (1, self.dim), jnp.float32)
        return v

    def pe_encode(self, v, coords_01):
        """Random-Fourier positional encoding of [0,1] coords (..., 2)."""
        c = 2 * coords_01.astype(jnp.float32) - 1
        c = c @ v["pe_gaussian"]
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self, v):
        h, w = self.embed_size
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)  # (h, w, 2)
        return self.pe_encode(v, grid)  # (h, w, dim)

    def encode_points(self, v, points, labels):
        """points (B, P, 2) pixels; labels (B, P): 1 fg, 0 bg, -1 pad, 2/3 box corners.

        +0.5 shifts to the pixel center (reference encoders.py _embed_points)."""
        coords = (points + 0.5) / jnp.asarray([self.input_size[1], self.input_size[0]], jnp.float32)
        pe = self.pe_encode(v, coords)  # (B, P, dim)
        lbl = labels.astype(jnp.int32)
        emb = jnp.where((lbl == -1)[..., None], v["not_a_point"][0] + jnp.zeros_like(pe), pe)
        for t in range(self.n_point_embeds):
            emb = emb + jnp.where((lbl == t)[..., None], v["point_embeds"][t], 0.0)
        return emb

    def encode_mask(self, v, mask, ctx: Ctx):
        y = self.mask_down1(v["mask_down1"], mask, ctx)
        y = jax.nn.gelu(self.mask_ln1(v["mask_ln1"], y, ctx), approximate=False)
        y = self.mask_down2(v["mask_down2"], y.astype(ctx.dtype), ctx)
        y = jax.nn.gelu(self.mask_ln2(v["mask_ln2"], y, ctx), approximate=False)
        return self.mask_down3(v["mask_down3"], y.astype(ctx.dtype), ctx)


class TwoWayAttention(Module):
    def __init__(self, dim, num_heads, downsample_rate=1):
        self.nh = num_heads
        self.internal = dim // downsample_rate
        self.hd = self.internal // num_heads
        self.q_proj = Linear(dim, self.internal)
        self.k_proj = Linear(dim, self.internal)
        self.v_proj = Linear(dim, self.internal)
        self.out_proj = Linear(self.internal, dim)

    def __call__(self, v, q, k, val, ctx: Ctx):
        b, nq, _ = q.shape
        qh = self.q_proj(v["q_proj"], q, ctx).reshape(b, nq, self.nh, self.hd)
        kh = self.k_proj(v["k_proj"], k, ctx).reshape(b, k.shape[1], self.nh, self.hd)
        vh = self.v_proj(v["v_proj"], val, ctx).reshape(b, val.shape[1], self.nh, self.hd)
        attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(self.hd), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, nq, self.internal)
        return self.out_proj(v["out_proj"], out, ctx)


class TwoWayBlock(Module):
    """One two-way transformer layer (reference transformer.TwoWayAttentionBlock)."""

    def __init__(self, dim, num_heads, mlp_dim=2048, skip_first_pe=False):
        self.self_attn = TwoWayAttention(dim, num_heads)
        self.norm1 = LayerNorm(dim)
        self.cross_t2i = TwoWayAttention(dim, num_heads, downsample_rate=2)
        self.norm2 = LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim, act="relu")  # reference transformer.py uses ReLU here
        self.norm3 = LayerNorm(dim)
        self.cross_i2t = TwoWayAttention(dim, num_heads, downsample_rate=2)
        self.norm4 = LayerNorm(dim)
        self.skip_first_pe = skip_first_pe

    def __call__(self, v, queries, keys, q_pe, k_pe, ctx: Ctx):
        if self.skip_first_pe:
            # reference transformer.py:236 — NO residual on the first self-attn
            queries = self.self_attn(v["self_attn"], queries, queries, queries, ctx)
        else:
            q = queries + q_pe
            queries = queries + self.self_attn(v["self_attn"], q, q, queries, ctx)
        queries = self.norm1(v["norm1"], queries, ctx)
        q = queries + q_pe
        k = keys + k_pe
        queries = self.norm2(v["norm2"], queries + self.cross_t2i(v["cross_t2i"], q, k, keys, ctx), ctx)
        queries = self.norm3(v["norm3"], queries + self.mlp(v["mlp"], queries, ctx), ctx)
        q = queries + q_pe
        keys = self.norm4(v["norm4"], keys + self.cross_i2t(v["cross_i2t"], k, q, queries, ctx), ctx)
        return queries, keys


class MaskDecoder(Module):
    """Two-way transformer mask decoder with IoU head (reference decoders.MaskDecoder)."""

    def __init__(self, dim=256, num_heads=8, depth=2, num_multimask=3, mlp_dim=2048):
        self.dim = dim
        self.num_mask_tokens = num_multimask + 1
        self.blocks = [TwoWayBlock(dim, num_heads, mlp_dim=mlp_dim, skip_first_pe=(i == 0)) for i in range(depth)]
        self.final_t2i = TwoWayAttention(dim, num_heads, downsample_rate=2)
        self.final_norm = LayerNorm(dim)
        # output upscaling (transposed convs)
        self.up1 = None  # conv_transpose params in init
        self.up_ln = LayerNorm2d(dim // 4)
        self.hyper_mlps = [
            _SamMLP(dim, dim, dim // 8, 3) for _ in range(self.num_mask_tokens)
        ]
        self.iou_head = _SamMLP(dim, 256, self.num_mask_tokens, 3)

    def init(self, key):
        v = super().init(key)
        v["iou_token"] = jax.random.normal(_child_key(key, "iou"), (1, self.dim), jnp.float32)
        v["mask_tokens"] = jax.random.normal(_child_key(key, "mt"), (self.num_mask_tokens, self.dim), jnp.float32)
        d = self.dim
        v["up1"] = {
            "kernel": jax.random.normal(_child_key(key, "u1"), (2, 2, d // 4, d), jnp.float32) * 0.02,
            "bias": jnp.zeros((d // 4,), jnp.float32),
        }
        v["up2"] = {
            "kernel": jax.random.normal(_child_key(key, "u2"), (2, 2, d // 8, d // 4), jnp.float32) * 0.02,
            "bias": jnp.zeros((d // 8,), jnp.float32),
        }
        return v

    def __call__(self, v, image_embed, image_pe, sparse_prompt, dense_prompt, ctx: Ctx):
        """image_embed (B, H, W, C); sparse_prompt (B, P, C); dense_prompt (B, H, W, C)."""
        b, h, w, c = image_embed.shape
        tokens = jnp.concatenate(
            [jnp.broadcast_to(jnp.concatenate([v["iou_token"], v["mask_tokens"]], 0)[None], (b, self.num_mask_tokens + 1, c)), sparse_prompt],
            axis=1,
        )
        src = (image_embed + dense_prompt).reshape(b, h * w, c)
        pos = image_pe.reshape(1, h * w, c)
        pos = jnp.broadcast_to(pos, (b, h * w, c))

        queries, keys = tokens, src
        q_pe = tokens
        for i, blk in enumerate(self.blocks):
            queries, keys = blk(v["blocks"][str(i)], queries, keys, q_pe, pos, ctx)
        q = queries + q_pe
        k = keys + pos
        queries = self.final_norm(v["final_norm"], queries + self.final_t2i(v["final_t2i"], q, k, keys, ctx), ctx)

        iou_out = queries[:, 0]
        mask_tokens_out = queries[:, 1 : 1 + self.num_mask_tokens]

        # upscale image features 4x
        src2 = keys.reshape(b, h, w, c).astype(jnp.float32)
        up = jax.lax.conv_transpose(src2, v["up1"]["kernel"], (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True) + v["up1"]["bias"]
        up = jax.nn.gelu(self.up_ln(v["up_ln"], up, ctx), approximate=False)
        up = jax.lax.conv_transpose(up, v["up2"]["kernel"], (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True) + v["up2"]["bias"]
        up = jax.nn.gelu(up, approximate=False)  # (B, 4h, 4w, c/8)

        hyper = jnp.stack(
            [m(v["hyper_mlps"][str(i)], mask_tokens_out[:, i], ctx) for i, m in enumerate(self.hyper_mlps)], axis=1
        )  # (B, T, c/8)
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)
        iou_pred = self.iou_head(v["iou_head"], iou_out, ctx)  # (B, T)
        return masks, iou_pred


class _SamMLP(Module):
    def __init__(self, c_in, c_hidden, c_out, n, sigmoid=False):
        dims = [c_in] + [c_hidden] * (n - 1) + [c_out]
        self.layers = [Linear(dims[i], dims[i + 1]) for i in range(n)]
        self.sigmoid = sigmoid

    def __call__(self, v, x, ctx: Ctx):
        n = len(self.layers)
        for i, l in enumerate(self.layers):
            x = l(v["layers"][str(i)], x, ctx)
            if i < n - 1:
                x = jax.nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x
