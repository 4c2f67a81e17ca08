"""SAM2 building blocks, TPU-first (NHWC functional pytrees, static shapes).

Capability parity with the reference SAM2 stack:
* Hiera hierarchical trunk + FPN neck — `ultralytics/models/sam/modules/encoders.py:446-794`
* sine position embedding — `modules/blocks.py:698`
* memory encoder (mask downsampler + ConvNeXt fuser) — `encoders.py:378`, `blocks.py:54-264`
* RoPE memory attention — `memory_attention.py:12-237`, `blocks.py:405`
* SAM2 mask decoder (obj-score token, high-res skips, dynamic multimask) —
  `decoders.py:176-518`

TPU re-design notes: rotary encoding uses real cos/sin pair rotation (no complex
dtype), attention over the memory bank takes an additive validity bias so the
bank can be padded to a static length (one XLA compile for the whole video),
and drop-path/dropout are inference no-ops.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.models.sam.modules import LayerNorm2d, MLPBlock, TwoWayAttention, TwoWayBlock, _SamMLP
from drone_yolo_tpu.nn.modules import Conv2dRaw, Ctx, Module, _child_key
from drone_yolo_tpu.nn.transformer import LayerNorm, Linear


# ---------------------------------------------------------------------------
# position embeddings
# ---------------------------------------------------------------------------
def sine_pos_embed(h, w, channels, temperature=10000.0):
    """2D sine position embedding, (h, w, channels); reference blocks.py:780."""
    half = channels // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = y / (h + 1e-6) * (2 * math.pi)
    x = x / (w + 1e-6) * (2 * math.pi)
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pos_x = jnp.broadcast_to(x[..., None], (h, w, half)) / dim_t
    pos_y = jnp.broadcast_to(y[..., None] + jnp.zeros((h, w, 1)), (h, w, half)) / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], -1).reshape(h, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], -1).reshape(h, w, half)
    return jnp.concatenate([pos_y, pos_x], -1)


def get_1d_sine_pe(pos, dim, temperature=10000.0):
    """1D sine embedding of positions (...,) -> (..., dim); reference utils.py:63."""
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], -1)


def _torch_cubic_weights(n_in, n_out, a=-0.75):
    """Interpolation matrix (n_out, n_in) matching torch F.interpolate
    bicubic (align_corners=False, edge-replicated, Keys kernel a=-0.75).
    Built host-side with numpy at trace time — static shapes."""

    def k(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    W = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        j0 = int(np.floor(src))
        for t in range(-1, 3):
            j = j0 + t
            w = k(src - j)
            W[i, min(max(j, 0), n_in - 1)] += w
    return W


def axial_rope_angles(h, w, head_dim, theta=10000.0):
    """Axial RoPE rotation angles for an (h*w) grid: (h*w, head_dim//2).

    First head_dim//4 pair-channels rotate with the x coordinate, the rest with
    y (reference utils.py:82 compute_axial_cis)."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 4, dtype=jnp.float32)[:quarter] / head_dim))
    t = jnp.arange(h * w, dtype=jnp.float32)
    tx, ty = t % w, jnp.floor(t / w)
    ang_x = tx[:, None] * freqs[None]
    ang_y = ty[:, None] * freqs[None]
    return jnp.concatenate([ang_x, ang_y], -1)  # (hw, head_dim//2)


def apply_rope(x, angles):
    """Rotate channel pairs of x (..., N, d) by angles (N, d//2)."""
    x0, x1 = x[..., 0::2], x[..., 1::2]
    c, s = jnp.cos(angles), jnp.sin(angles)
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    return jnp.stack([out0, out1], -1).reshape(x.shape)


# ---------------------------------------------------------------------------
# Hiera trunk
# ---------------------------------------------------------------------------
def _window_partition(x, win):
    b, h, w, c = x.shape
    ph, pw = (win - h % win) % win, (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win, win, c), (hp, wp)


def _window_unpartition(x, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // win * wp // win)
    x = x.reshape(b, hp // win, wp // win, win, win, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


class MultiScaleAttention(Module):
    """Windowless multiscale attention with optional 2x2 maxpool on q
    (reference blocks.py:503)."""

    def __init__(self, dim, dim_out, num_heads, q_pool=False):
        self.dim, self.dim_out, self.nh = dim, dim_out, num_heads
        self.q_pool = q_pool
        self.qkv = Linear(dim, dim_out * 3)
        self.proj = Linear(dim_out, dim_out)

    def __call__(self, v, x, ctx: Ctx):
        b, h, w, _ = x.shape
        qkv = self.qkv(v["qkv"], x, ctx).reshape(b, h * w, 3, self.nh, -1)
        q, k, vv = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = q.reshape(b, h, w, -1)
            q = jax.lax.reduce_window(
                q, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.nh, -1)
        hd = q.shape[-1]
        attn = jax.nn.softmax(jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vv).reshape(b, h, w, self.dim_out)
        return self.proj(v["proj"], out, ctx)


class MultiScaleBlock(Module):
    """Hiera block: windowed multiscale attention + MLP with q-pool stage shifts
    (reference blocks.py:583)."""

    def __init__(self, dim, dim_out, num_heads, window=0, q_stride=False, mlp_ratio=4.0):
        self.dim, self.dim_out, self.window, self.q_stride = dim, dim_out, window, q_stride
        self.norm1 = LayerNorm(dim)
        self.attn = MultiScaleAttention(dim, dim_out, num_heads, q_pool=q_stride)
        self.norm2 = LayerNorm(dim_out)
        self.mlp = MLPBlock(dim_out, int(dim_out * mlp_ratio))
        if dim != dim_out:
            self.proj = Linear(dim, dim_out)

    def __call__(self, v, x, ctx: Ctx):
        shortcut = x
        y = self.norm1(v["norm1"], x, ctx)
        if self.dim != self.dim_out:
            shortcut = self.proj(v["proj"], y, ctx)
            if self.q_stride:
                shortcut = jax.lax.reduce_window(
                    shortcut, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        win = self.window
        hw = y.shape[1:3]
        if win:
            y, pad_hw = _window_partition(y, win)
        y = self.attn(v["attn"], y, ctx)
        if self.q_stride:
            win = self.window // 2
            h, w = shortcut.shape[1:3]
            pad_hw = ((h + (win - h % win) % win) if win else h, (w + (win - w % win) % win) if win else w)
            hw = (h, w)
        if self.window:
            y = _window_unpartition(y, win, pad_hw, hw)
        x = shortcut + y
        return x + self.mlp(v["mlp"], self.norm2(v["norm2"], x, ctx), ctx)


class Hiera(Module):
    """Hierarchical trunk (reference encoders.py:645). Returns one NHWC feature
    map per stage, strides (4, 8, 16, 32)."""

    def __init__(
        self,
        embed_dim=96,
        num_heads=1,
        stages=(1, 2, 7, 2),
        global_att_blocks=(5, 7, 9),
        window_spec=(8, 4, 14, 7),
        window_pos_bkg=(7, 7),
        q_pool=3,
    ):
        depth = sum(stages)
        self.stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
        q_pool_blocks = [x + 1 for x in self.stage_ends[:-1]][:q_pool]
        self.embed_dim = embed_dim
        self.window_spec = window_spec
        self.window_pos_bkg = window_pos_bkg
        self.patch_embed = Conv2dRaw(3, embed_dim, 7, 4, p=3, bias=True)
        self.blocks = []
        dim, heads, cur_stage = embed_dim, num_heads, 1
        for i in range(depth):
            # window lags a block: the first block of a new stage keeps the
            # previous stage's window size (reference encoders.py:744)
            window = self.window_spec[cur_stage - 1]
            if i in global_att_blocks:
                window = 0
            dim_out = dim
            if i - 1 in self.stage_ends:  # first block of a new stage
                dim_out = dim * 2
                heads = heads * 2
                cur_stage += 1
            self.blocks.append(
                MultiScaleBlock(dim, dim_out, heads, window=window, q_stride=(i in q_pool_blocks))
            )
            dim = dim_out
        self.channel_list = [self.blocks[i].dim_out for i in self.stage_ends]  # low->high stride

    def init(self, key):
        v = super().init(key)
        h, w = self.window_pos_bkg
        win = self.window_spec[0]
        v["pos_embed"] = jnp.zeros((1, h, w, self.embed_dim), jnp.float32)
        v["pos_embed_window"] = jnp.zeros((1, win, win, self.embed_dim), jnp.float32)
        return v

    def _pos_embed(self, v, h, w):
        # torch-exact bicubic (a=-0.75) via static interpolation matrices;
        # jax.image.resize's bicubic uses a=-0.5 and diverges from checkpoints
        bh, bw = self.window_pos_bkg
        Wh = jnp.asarray(_torch_cubic_weights(bh, h))
        Ww = jnp.asarray(_torch_cubic_weights(bw, w))
        pe = jnp.einsum("hi,biwc->bhwc", Wh, jnp.einsum("wj,bijc->biwc", Ww, v["pos_embed"]))
        win = v["pos_embed_window"]
        tiles = (1, h // win.shape[1], w // win.shape[2], 1)
        return pe + jnp.tile(win, tiles)

    def __call__(self, v, x, ctx: Ctx):
        y = self.patch_embed(v["patch_embed"], x, ctx)
        y = y + self._pos_embed(v, y.shape[1], y.shape[2]).astype(y.dtype)
        outs = []
        for i, blk in enumerate(self.blocks):
            y = blk(v["blocks"][str(i)], y, ctx)
            if i in self.stage_ends:
                outs.append(y)
        return outs  # strides 4, 8, 16, 32


class FpnNeck(Module):
    """FPN neck: lateral 1x1 convs, nearest top-down on the configured levels
    (reference encoders.py:501). Returns ([feats low->high stride], [pos])."""

    def __init__(self, d_model, backbone_channels, top_down_levels=(2, 3)):
        # backbone_channels given low->high stride (Hiera output order)
        self.d_model = d_model
        self.top_down_levels = top_down_levels
        self.convs = [Conv2dRaw(c, d_model, 1, 1, p=0, bias=True) for c in backbone_channels]

    def __call__(self, v, xs, ctx: Ctx):
        n = len(xs)
        out = [None] * n
        pos = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):
            lateral = self.convs[i](v["convs"][str(i)], xs[i], ctx)
            if i in self.top_down_levels and prev is not None:
                b, h, w, c = prev.shape
                td = jax.image.resize(prev.astype(jnp.float32), (b, h * 2, w * 2, c), method="nearest")
                prev = lateral + td.astype(lateral.dtype)
            else:
                prev = lateral
            out[i] = prev
            pos[i] = sine_pos_embed(prev.shape[1], prev.shape[2], self.d_model)
        return out, pos


class ImageEncoder(Module):
    """Hiera trunk + FPN neck; scalp drops the lowest-resolution level
    (reference encoders.py:446)."""

    def __init__(self, trunk: Hiera, neck: FpnNeck, scalp: int = 1):
        self.trunk = trunk
        self.neck = neck
        self.scalp = scalp

    def __call__(self, v, x, ctx: Ctx):
        feats, pos = self.neck(v["neck"], self.trunk(v["trunk"], x, ctx), ctx)
        if self.scalp > 0:
            feats, pos = feats[: -self.scalp], pos[: -self.scalp]
        return {"backbone_fpn": feats, "vision_pos_enc": pos}


# ---------------------------------------------------------------------------
# memory encoder
# ---------------------------------------------------------------------------
class MaskDownSampler(Module):
    """Stride-16 conv pyramid embedding a (B, H, W, 1) mask (reference blocks.py:54)."""

    def __init__(self, embed_dim=256, total_stride=16, stride=2, k=3):
        n = int(math.log2(total_stride) / math.log2(stride))
        cin, layers, lns = 1, [], []
        for _ in range(n):
            cout = cin * stride * stride
            layers.append(Conv2dRaw(cin, cout, k, stride, p=k // 2, bias=True))
            lns.append(LayerNorm2d(cout))
            cin = cout
        self.layers, self.lns = layers, lns
        self.final = Conv2dRaw(cin, embed_dim, 1, bias=True)

    def __call__(self, v, x, ctx: Ctx):
        for i, (conv, ln) in enumerate(zip(self.layers, self.lns)):
            x = conv(v["layers"][str(i)], x, ctx)
            x = jax.nn.gelu(ln(v["lns"][str(i)], x, ctx), approximate=False).astype(ctx.dtype)
        return self.final(v["final"], x, ctx)


class CXBlock(Module):
    """ConvNeXt block with layer scale (reference blocks.py:114)."""

    def __init__(self, dim, k=7):
        self.dim = dim
        self.dwconv = Conv2dRaw(dim, dim, k, 1, p=k // 2, g=dim, bias=True)
        self.norm = LayerNorm2d(dim)
        self.pw1 = Linear(dim, dim * 4)
        self.pw2 = Linear(dim * 4, dim)

    def init(self, key):
        v = super().init(key)
        v["gamma"] = jnp.full((self.dim,), 1e-6, jnp.float32)
        return v

    def __call__(self, v, x, ctx: Ctx):
        y = self.dwconv(v["dwconv"], x, ctx)
        y = self.norm(v["norm"], y, ctx)
        y = self.pw2(v["pw2"], jax.nn.gelu(self.pw1(v["pw1"], y, ctx), approximate=False), ctx)
        return x + v["gamma"] * y


class MemoryEncoder(Module):
    """Fuses pixel features with the predicted mask into compact memory features
    (reference encoders.py:378). Returns ((B, h, w, out_dim), pos)."""

    def __init__(self, out_dim=64, in_dim=256, num_cx=2):
        self.mask_downsampler = MaskDownSampler(embed_dim=in_dim)
        self.pix_feat_proj = Conv2dRaw(in_dim, in_dim, 1, bias=True)
        self.fuser = [CXBlock(in_dim) for _ in range(num_cx)]
        self.out_dim = out_dim
        self.out_proj = Conv2dRaw(in_dim, out_dim, 1, bias=True) if out_dim != in_dim else None

    def __call__(self, v, pix_feat, masks_sigmoid, ctx: Ctx):
        m = self.mask_downsampler(v["mask_downsampler"], masks_sigmoid, ctx)
        x = self.pix_feat_proj(v["pix_feat_proj"], pix_feat, ctx) + m
        for i, blk in enumerate(self.fuser):
            x = blk(v["fuser"][str(i)], x, ctx)
        if self.out_proj is not None:
            x = self.out_proj(v["out_proj"], x, ctx)
        pos = sine_pos_embed(x.shape[1], x.shape[2], self.out_dim)
        return x, pos


# ---------------------------------------------------------------------------
# memory attention
# ---------------------------------------------------------------------------
class RoPEAttention(Module):
    """Attention with axial rotary position encoding on q/k (reference
    blocks.py:405). Supports a static key-validity bias for padded memory banks
    and excluding trailing tokens (object pointers) from RoPE."""

    def __init__(self, dim, num_heads=1, kv_in_dim=None, rope_k_repeat=False):
        kv = kv_in_dim or dim
        self.nh, self.dim = num_heads, dim
        self.hd = dim // num_heads
        self.rope_k_repeat = rope_k_repeat
        self.q_proj = Linear(dim, dim)
        self.k_proj = Linear(kv, dim)
        self.v_proj = Linear(kv, dim)
        self.out_proj = Linear(dim, dim)

    def __call__(self, v, q, k, val, q_hw, ctx: Ctx, key_bias=None, num_k_exclude_rope=0):
        b, nq, _ = q.shape
        nk = k.shape[1]
        qh = self.q_proj(v["q_proj"], q, ctx).reshape(b, nq, self.nh, self.hd).transpose(0, 2, 1, 3)
        kh = self.k_proj(v["k_proj"], k, ctx).reshape(b, nk, self.nh, self.hd).transpose(0, 2, 1, 3)
        vh = self.v_proj(v["v_proj"], val, ctx).reshape(b, nk, self.nh, self.hd).transpose(0, 2, 1, 3)
        angles = axial_rope_angles(q_hw[0], q_hw[1], self.hd)
        qh = apply_rope(qh, angles)
        n_rope = nk - num_k_exclude_rope
        if n_rope > 0:
            if n_rope != nq:
                assert self.rope_k_repeat and n_rope % nq == 0, (n_rope, nq)
                k_angles = jnp.tile(angles, (n_rope // nq, 1))
            else:
                k_angles = angles
            kh = jnp.concatenate([apply_rope(kh[:, :, :n_rope], k_angles), kh[:, :, n_rope:]], axis=2)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(self.hd)
        if key_bias is not None:
            attn = attn + key_bias[None, None, None, :]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh).transpose(0, 2, 1, 3).reshape(b, nq, self.dim)
        return self.out_proj(v["out_proj"], out, ctx)


class MemoryAttentionLayer(Module):
    """Self-attn + cross-attn-to-memory + FFN (reference memory_attention.py:12)."""

    def __init__(self, d_model=256, dim_ff=2048, mem_dim=64):
        self.self_attn = RoPEAttention(d_model, num_heads=1)
        self.cross_attn = RoPEAttention(d_model, num_heads=1, kv_in_dim=mem_dim, rope_k_repeat=True)
        self.norm1 = LayerNorm(d_model)
        self.norm2 = LayerNorm(d_model)
        self.norm3 = LayerNorm(d_model)
        self.lin1 = Linear(d_model, dim_ff)
        self.lin2 = Linear(dim_ff, d_model)

    def __call__(self, v, tgt, memory, mem_pos, query_pos, q_hw, ctx: Ctx, key_bias=None, n_obj_tokens=0):
        t2 = self.norm1(v["norm1"], tgt, ctx)
        tgt = tgt + self.self_attn(v["self_attn"], t2, t2, t2, q_hw, ctx)
        t2 = self.norm2(v["norm2"], tgt, ctx)
        tgt = tgt + self.cross_attn(
            v["cross_attn"], t2, memory + mem_pos, memory, q_hw, ctx,
            key_bias=key_bias, num_k_exclude_rope=n_obj_tokens,
        )
        t2 = self.norm3(v["norm3"], tgt, ctx)
        return tgt + self.lin2(v["lin2"], jax.nn.relu(self.lin1(v["lin1"], t2, ctx)), ctx)


class SAM2MaskDecoder(Module):
    """SAM2 mask decoder: object-score token, high-resolution skip features, and
    dynamic multimask-by-stability (reference decoders.py:176)."""

    def __init__(self, dim=256, num_heads=8, depth=2, num_multimask=3, mlp_dim=2048,
                 stability_delta=0.05, stability_thresh=0.98):
        self.dim = dim
        self.num_mask_tokens = num_multimask + 1
        self.stability_delta = stability_delta
        self.stability_thresh = stability_thresh
        self.blocks = [TwoWayBlock(dim, num_heads, mlp_dim=mlp_dim, skip_first_pe=(i == 0)) for i in range(depth)]
        self.final_t2i = TwoWayAttention(dim, num_heads, downsample_rate=2)
        self.final_norm = LayerNorm(dim)
        self.up_ln = LayerNorm2d(dim // 4)
        self.conv_s0 = Conv2dRaw(dim, dim // 8, 1, bias=True)
        self.conv_s1 = Conv2dRaw(dim, dim // 4, 1, bias=True)
        self.hyper_mlps = [_SamMLP(dim, dim, dim // 8, 3) for _ in range(self.num_mask_tokens)]
        self.iou_head = _SamMLP(dim, 256, self.num_mask_tokens, 3, sigmoid=True)
        self.obj_score_head = _SamMLP(dim, dim, 1, 3)

    def init(self, key):
        v = super().init(key)
        d = self.dim
        for name, shape in (
            ("obj_score_token", (1, d)),
            ("iou_token", (1, d)),
            ("mask_tokens", (self.num_mask_tokens, d)),
        ):
            v[name] = jax.random.normal(_child_key(key, name), shape, jnp.float32) * 0.02
        v["up1"] = {
            "kernel": jax.random.normal(_child_key(key, "u1"), (2, 2, d // 4, d), jnp.float32) * 0.02,
            "bias": jnp.zeros((d // 4,), jnp.float32),
        }
        v["up2"] = {
            "kernel": jax.random.normal(_child_key(key, "u2"), (2, 2, d // 8, d // 4), jnp.float32) * 0.02,
            "bias": jnp.zeros((d // 8,), jnp.float32),
        }
        return v

    def __call__(self, v, image_embed, image_pe, sparse, dense, ctx: Ctx, high_res_feats=None, multimask=False):
        """image_embed (B,h,w,C), high_res_feats: [(B,4h,4w,C/8), (B,2h,2w,C/4)]
        already projected by conv_s0/conv_s1. Returns (masks, iou, sam_tokens,
        obj_score_logits)."""
        b, h, w, c = image_embed.shape
        fixed = jnp.concatenate([v["obj_score_token"], v["iou_token"], v["mask_tokens"]], 0)
        tokens = jnp.concatenate([jnp.broadcast_to(fixed[None], (b,) + fixed.shape), sparse], axis=1)
        src = (image_embed + dense).reshape(b, h * w, c)
        pos = jnp.broadcast_to(image_pe.reshape(1, h * w, c), (b, h * w, c))

        queries, keys = tokens, src
        for i, blk in enumerate(self.blocks):
            queries, keys = blk(v["blocks"][str(i)], queries, keys, tokens, pos, ctx)
        q = queries + tokens
        k = keys + pos
        queries = self.final_norm(
            v["final_norm"], queries + self.final_t2i(v["final_t2i"], q, k, keys, ctx), ctx
        )

        obj_score_logits = self.obj_score_head(v["obj_score_head"], queries[:, 0], ctx)  # (B, 1)
        iou_pred = self.iou_head(v["iou_head"], queries[:, 1], ctx)  # (B, T)
        mask_tokens_out = queries[:, 2 : 2 + self.num_mask_tokens]

        src2 = keys.reshape(b, h, w, c).astype(jnp.float32)
        up = jax.lax.conv_transpose(src2, v["up1"]["kernel"], (2, 2), "VALID",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True) + v["up1"]["bias"]
        if high_res_feats is not None:
            up = up + high_res_feats[1].astype(jnp.float32)
        up = jax.nn.gelu(self.up_ln(v["up_ln"], up, ctx), approximate=False)
        up = jax.lax.conv_transpose(up, v["up2"]["kernel"], (2, 2), "VALID",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True) + v["up2"]["bias"]
        if high_res_feats is not None:
            up = up + high_res_feats[0].astype(jnp.float32)
        up = jax.nn.gelu(up, approximate=False)

        hyper = jnp.stack(
            [m(v["hyper_mlps"][str(i)], mask_tokens_out[:, i], ctx) for i, m in enumerate(self.hyper_mlps)], axis=1
        )
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)  # (B, T, 4h, 4w)

        if multimask:
            out_masks, out_iou = masks[:, 1:], iou_pred[:, 1:]
            sam_tokens = mask_tokens_out[:, 1:]
        else:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
            sam_tokens = mask_tokens_out[:, :1]
        return out_masks, out_iou, sam_tokens, obj_score_logits

    def _stability(self, masks):
        """area(logits > +d) / area(logits > -d) per mask (reference decoders.py:472)."""
        flat = masks.reshape(masks.shape[:2] + (-1,))
        hi = jnp.sum(flat > self.stability_delta, axis=-1).astype(jnp.float32)
        lo = jnp.sum(flat > -self.stability_delta, axis=-1).astype(jnp.float32)
        return jnp.where(lo > 0, hi / jnp.maximum(lo, 1.0), 1.0)

    def _dynamic_multimask(self, masks, iou_pred):
        """Single-mask output with fallback to the best multimask when the
        single-mask token is unstable (reference decoders.py:484)."""
        multi, multi_iou = masks[:, 1:], iou_pred[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)  # (B,)
        best_mask = jnp.take_along_axis(multi, best[:, None, None, None], axis=1)
        best_iou = jnp.take_along_axis(multi_iou, best[:, None], axis=1)
        stable = self._stability(masks[:, :1])[:, 0] >= self.stability_thresh  # (B,)
        out_mask = jnp.where(stable[:, None, None, None], masks[:, :1], best_mask)
        out_iou = jnp.where(stable[:, None], iou_pred[:, :1], best_iou)
        return out_mask, out_iou


class MemoryAttention(Module):
    """Stack of memory attention layers (reference memory_attention.py:140)."""

    def __init__(self, d_model=256, num_layers=4, mem_dim=64):
        self.d_model = d_model
        self.layers = [MemoryAttentionLayer(d_model, mem_dim=mem_dim) for _ in range(num_layers)]
        self.norm = LayerNorm(d_model)

    def __call__(self, v, curr, memory, curr_pos, mem_pos, q_hw, ctx: Ctx, key_bias=None, n_obj_tokens=0):
        out = curr + 0.1 * curr_pos  # pos_enc_at_input
        for i, layer in enumerate(self.layers):
            out = layer(
                v["layers"][str(i)], out, memory, mem_pos, curr_pos, q_hw, ctx,
                key_bias=key_bias, n_obj_tokens=n_obj_tokens,
            )
        return self.norm(v["norm"], out, ctx)
