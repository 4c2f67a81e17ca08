"""Transformer modules for RT-DETR: AIFI encoder, deformable decoder, MLP heads.

Capability parity with `ultralytics/nn/modules/transformer.py` (
TransformerEncoderLayer:28, AIFI:86, MLP:174, MSDeformAttn:218,
DeformableTransformerDecoderLayer:312, DeformableTransformerDecoder:374) and
`head.py:361` (RTDETRDecoder).

TPU notes: multiscale deformable attention is a gather problem — each (query,
head, level, point) bilinearly samples a value map. It lowers to 4 batched
`take_along_axis` gathers per level over the flattened H*W axis; everything is
static-shape (nq queries, fixed levels/points) so the whole head jits into the
same XLA program as the backbone.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.nn.modules import Conv2dRaw, Ctx, Module, _bn_apply, _bn_fold, _bn_init, _child_key


def _xavier_uniform(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class Linear(Module):
    """Dense layer; kernel stored (in, out) — torch Linear transposed on convert."""

    def __init__(self, c_in, c_out, bias=True):
        self.c_in, self.c_out, self.bias = c_in, c_out, bias

    def init(self, key):
        bound = 1.0 / math.sqrt(self.c_in)
        v = {"kernel": jax.random.uniform(_child_key(key, "w"), (self.c_in, self.c_out), jnp.float32, -bound, bound)}
        if self.bias:
            v["bias"] = jax.random.uniform(_child_key(key, "b"), (self.c_out,), jnp.float32, -bound, bound)
        return v

    def __call__(self, v, x, ctx: Ctx):
        y = x.astype(jnp.float32) @ v["kernel"]
        if self.bias:
            y = y + v["bias"]
        return y


class LayerNorm(Module):
    def __init__(self, c):
        self.c = c

    def init(self, key):
        return {"scale": jnp.ones((self.c,), jnp.float32), "bias": jnp.zeros((self.c,), jnp.float32)}

    def __call__(self, v, x, ctx: Ctx):
        x = x.astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * v["scale"] + v["bias"]


class MultiheadAttention(Module):
    """Standard MHA matching torch nn.MultiheadAttention parameterization
    (packed in_proj weight/bias + out_proj)."""

    def __init__(self, d_model, num_heads):
        self.d = d_model
        self.h = num_heads
        self.in_proj = Linear(d_model, 3 * d_model)
        self.out_proj = Linear(d_model, d_model)

    def __call__(self, v, q, k, val, ctx: Ctx, attn_mask=None):
        b, nq, d = q.shape
        hd = d // self.h
        wq, wk, wv = jnp.split(v["in_proj"]["kernel"], 3, axis=1)
        bq, bk, bv = jnp.split(v["in_proj"]["bias"], 3)
        qh = (q.astype(jnp.float32) @ wq + bq).reshape(b, nq, self.h, hd)
        kh = (k.astype(jnp.float32) @ wk + bk).reshape(b, k.shape[1], self.h, hd)
        vh = (val.astype(jnp.float32) @ wv + bv).reshape(b, val.shape[1], self.h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        if attn_mask is not None:
            logits = jnp.where(attn_mask[None, None], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, nq, d)
        return self.out_proj(v["out_proj"], out, ctx)


class MLP(Module):
    """Stacked linears with ReLU (reference transformer.py:174)."""

    def __init__(self, c_in, c_hidden, c_out, num_layers):
        dims = [c_in] + [c_hidden] * (num_layers - 1) + [c_out]
        self.layers = [Linear(dims[i], dims[i + 1]) for i in range(num_layers)]

    def __call__(self, v, x, ctx: Ctx):
        n = len(self.layers)
        for i, layer in enumerate(self.layers):
            x = layer(v["layers"][str(i)], x, ctx)
            if i < n - 1:
                x = jax.nn.relu(x)
        return x


class TransformerEncoderLayer(Module):
    """Post-norm encoder layer (reference transformer.py:28)."""

    def __init__(self, c1, cm=2048, num_heads=8):
        self.ma = MultiheadAttention(c1, num_heads)
        self.fc1 = Linear(c1, cm)
        self.fc2 = Linear(cm, c1)
        self.norm1 = LayerNorm(c1)
        self.norm2 = LayerNorm(c1)

    def __call__(self, v, src, ctx: Ctx, pos=None):
        q = k = src if pos is None else src + pos
        src2 = self.ma(v["ma"], q, k, src, ctx)
        src = self.norm1(v["norm1"], src + src2, ctx)
        src2 = self.fc2(v["fc2"], jax.nn.gelu(self.fc1(v["fc1"], src, ctx), approximate=False), ctx)
        return self.norm2(v["norm2"], src + src2, ctx)


class AIFI(TransformerEncoderLayer):
    """Intra-scale feature interaction on P5 with 2D sincos embedding
    (reference transformer.py:86). Input NHWC."""

    def __call__(self, v, x, ctx: Ctx):
        b, h, w, c = x.shape
        pos = self.build_2d_sincos(w, h, c)
        src = x.reshape(b, h * w, c)
        out = super().__call__(v, src, ctx, pos=pos[None])
        return out.reshape(b, h, w, c).astype(ctx.dtype)

    @staticmethod
    def build_2d_sincos(w, h, embed_dim=256, temperature=10000.0):
        grid_w = np.arange(w, dtype=np.float32)
        grid_h = np.arange(h, dtype=np.float32)
        gw, gh = np.meshgrid(grid_w, grid_h)
        pos_dim = embed_dim // 4
        omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
        out_w = gw.reshape(-1)[:, None] @ omega[None]
        out_h = gh.reshape(-1)[:, None] @ omega[None]
        return jnp.asarray(
            np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1), jnp.float32
        )


def bilinear_sample(value_map, loc, h, w):
    """Bilinearly sample (B, H*W, C) maps at (B, Q, 2) normalized [0,1] locations.

    Matches grid_sample(align_corners=False) used by the reference's
    multi_scale_deformable_attn_pytorch (modules/utils.py:42).
    """
    b, n, c = value_map.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        g = jnp.take_along_axis(value_map, idx[..., None], axis=1)  # (B, Q, C)
        return g * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    return (
        v00 * ((1 - dx) * (1 - dy))[..., None]
        + v01 * (dx * (1 - dy))[..., None]
        + v10 * ((1 - dx) * dy)[..., None]
        + v11 * (dx * dy)[..., None]
    )


class MSDeformAttn(Module):
    """Multiscale deformable attention (reference transformer.py:218)."""

    def __init__(self, d_model=256, n_levels=4, n_heads=8, n_points=4):
        self.d, self.nl, self.nh, self.np_ = d_model, n_levels, n_heads, n_points
        self.sampling_offsets = Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = Linear(d_model, d_model)
        self.output_proj = Linear(d_model, d_model)

    def init(self, key):
        v = super().init(key)
        # grid-prior init of sampling offsets (reference _reset_parameters)
        thetas = np.arange(self.nh, dtype=np.float32) * (2.0 * math.pi / self.nh)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, self.nl, self.np_, 1))
        for i in range(self.np_):
            grid[:, :, i, :] *= i + 1
        v["sampling_offsets"]["kernel"] = jnp.zeros_like(v["sampling_offsets"]["kernel"])
        v["sampling_offsets"]["bias"] = jnp.asarray(grid.reshape(-1))
        v["attention_weights"]["kernel"] = jnp.zeros_like(v["attention_weights"]["kernel"])
        v["attention_weights"]["bias"] = jnp.zeros_like(v["attention_weights"]["bias"])
        v["value_proj"]["kernel"] = _xavier_uniform(_child_key(key, "vp"), v["value_proj"]["kernel"].shape)
        v["value_proj"]["bias"] = jnp.zeros_like(v["value_proj"]["bias"])
        v["output_proj"]["kernel"] = _xavier_uniform(_child_key(key, "op"), v["output_proj"]["kernel"].shape)
        v["output_proj"]["bias"] = jnp.zeros_like(v["output_proj"]["bias"])
        return v

    def __call__(self, v, query, refer_bbox, value, value_shapes, ctx: Ctx):
        """query (B, Q, C); refer_bbox (B, Q, 4) in [0,1] cxcywh; value (B, sumHW, C)."""
        b, nq, _ = query.shape
        nh, nl, npts = self.nh, self.nl, self.np_
        hd = self.d // nh

        val = self.value_proj(v["value_proj"], value, ctx)  # (B, V, C)
        offsets = self.sampling_offsets(v["sampling_offsets"], query, ctx).reshape(b, nq, nh, nl, npts, 2)
        weights = self.attention_weights(v["attention_weights"], query, ctx).reshape(b, nq, nh, nl * npts)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, nq, nh, nl, npts)

        # reference num_points==4 path: offsets scaled by box wh
        add = offsets / npts * refer_bbox[:, :, None, None, None, 2:] * 0.5
        locs = refer_bbox[:, :, None, None, None, :2] + add  # (B, Q, nh, nl, P, 2)

        # split value per level and sample
        sizes = [h * w for h, w in value_shapes]
        starts = np.cumsum([0] + sizes[:-1]).tolist()
        out = jnp.zeros((b, nq, nh, hd), jnp.float32)
        val_heads = val.reshape(b, -1, nh, hd)
        for li, (h, w) in enumerate(value_shapes):
            vm = jax.lax.dynamic_slice_in_dim(val_heads, starts[li], sizes[li], axis=1)  # (B, hw, nh, hd)
            for hi in range(nh):
                lv = locs[:, :, hi, li, :, :]  # (B, Q, P, 2)
                sampled = bilinear_sample(
                    vm[:, :, hi, :], lv.reshape(b, nq * npts, 2), h, w
                ).reshape(b, nq, npts, hd)
                out = out.at[:, :, hi, :].add(jnp.sum(sampled * weights[:, :, hi, li, :, None], axis=2))
        out = out.reshape(b, nq, self.d)
        return self.output_proj(v["output_proj"], out, ctx)


class DeformableTransformerDecoderLayer(Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:312)."""

    def __init__(self, d_model=256, n_heads=8, d_ffn=1024, n_levels=4, n_points=4):
        self.self_attn = MultiheadAttention(d_model, n_heads)
        self.norm1 = LayerNorm(d_model)
        self.cross_attn = MSDeformAttn(d_model, n_levels, n_heads, n_points)
        self.norm2 = LayerNorm(d_model)
        self.linear1 = Linear(d_model, d_ffn)
        self.linear2 = Linear(d_ffn, d_model)
        self.norm3 = LayerNorm(d_model)

    def __call__(self, v, embed, refer_bbox, feats, shapes, ctx: Ctx, attn_mask=None, query_pos=None):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = self.self_attn(v["self_attn"], q, k, embed, ctx, attn_mask=attn_mask)
        embed = self.norm1(v["norm1"], embed + tgt, ctx)
        tgt = self.cross_attn(
            v["cross_attn"], embed if query_pos is None else embed + query_pos, refer_bbox, feats, shapes, ctx
        )
        embed = self.norm2(v["norm2"], embed + tgt, ctx)
        tgt = self.linear2(v["linear2"], jax.nn.relu(self.linear1(v["linear1"], embed, ctx)), ctx)
        return self.norm3(v["norm3"], embed + tgt, ctx)


def inverse_sigmoid(x, eps=1e-5):
    """Numerically-clamped logit: log(x / (1-x)) (RT-DETR decoder refinement)."""
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class RTDETRDecoder(Module):
    """RT-DETR decoder head (reference head.py:361).

    Simplifications vs the reference (documented): contrastive denoising (CDN)
    groups are not generated during training in this round — the dn path is
    None, matching the reference's inference behavior exactly; training works
    with pure query selection + Hungarian matching.
    """

    stride = [8, 16, 32]

    def __init__(self, nc=80, ch=(512, 1024, 2048), hd=256, nq=300, ndp=4, nh=8, ndl=6, d_ffn=1024, eval_idx=-1, learnt_init_query=False, **_):
        self.nc = nc
        self.nl = len(ch)
        self.hd = hd
        self.nq = nq
        self.ndl = ndl
        self.eval_idx = eval_idx if eval_idx >= 0 else ndl + eval_idx
        self.learnt_init_query = learnt_init_query
        self.input_proj = [Conv2dRaw(x, hd, 1, bias=False) for x in ch]
        self.layers = [DeformableTransformerDecoderLayer(hd, nh, d_ffn, self.nl, ndp) for _ in range(ndl)]
        self.query_pos_head = MLP(4, 2 * hd, hd, 2)
        self.enc_output = Linear(hd, hd)
        self.enc_output_norm = LayerNorm(hd)
        self.enc_score_head = Linear(hd, nc)
        self.enc_bbox_head = MLP(hd, hd, 4, 3)
        self.dec_score_head = [Linear(hd, nc) for _ in range(ndl)]
        self.dec_bbox_head = [MLP(hd, hd, 4, 3) for _ in range(ndl)]
        # BN after each input projection (reference input_proj Sequential conv+BN)
        self._bn_c = hd
        self.stride = [8, 16, 32][: self.nl]

    def init(self, key):
        v = super().init(key)
        v["input_proj_bn"] = {str(i): _bn_init(self._bn_c) for i in range(self.nl)}
        # CDN class embedding (reference denoising_class_embed); kept as a weight
        # for checkpoint parity even though CDN training lands in a later round
        v["denoising_class_embed"] = jax.random.normal(_child_key(key, "dn"), (self.nc, self.hd), jnp.float32)
        # prior-prob bias init (reference _reset_parameters)
        bias_cls = float(-np.log((1 - 0.01) / 0.01) / 80 * self.nc)
        v["enc_score_head"]["bias"] = jnp.full_like(v["enc_score_head"]["bias"], bias_cls)
        last = str(len(self.enc_bbox_head.layers) - 1)
        v["enc_bbox_head"]["layers"][last]["kernel"] = jnp.zeros_like(v["enc_bbox_head"]["layers"][last]["kernel"])
        v["enc_bbox_head"]["layers"][last]["bias"] = jnp.zeros_like(v["enc_bbox_head"]["layers"][last]["bias"])
        for i in range(self.ndl):
            v["dec_score_head"][str(i)]["bias"] = jnp.full_like(v["dec_score_head"][str(i)]["bias"], bias_cls)
            v["dec_bbox_head"][str(i)]["layers"][last]["kernel"] = jnp.zeros_like(v["dec_bbox_head"][str(i)]["layers"][last]["kernel"])
            v["dec_bbox_head"][str(i)]["layers"][last]["bias"] = jnp.zeros_like(v["dec_bbox_head"][str(i)]["layers"][last]["bias"])
        return v

    @staticmethod
    def _generate_anchors(shapes, grid_size=0.05, eps=1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
            xy = (np.stack([gx, gy], -1) + 0.5) / np.array([w, h], np.float32)
            wh = np.ones_like(xy) * grid_size * (2.0**i)
            anchors.append(np.concatenate([xy, wh], -1).reshape(-1, 4))
        anchors = np.concatenate(anchors)  # (A, 4)
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = np.log(anchors / (1 - anchors))
        anchors = np.where(valid, anchors, np.inf)
        return jnp.asarray(anchors), jnp.asarray(valid.astype(np.float32))

    def __call__(self, v, xs, ctx: Ctx):
        b = xs[0].shape[0]
        shapes = [(x.shape[1], x.shape[2]) for x in xs]
        feats = []
        for i, x in enumerate(xs):
            p = self.input_proj[i](v["input_proj"][str(i)], x, ctx)
            p = _bn_apply(v["input_proj_bn"][str(i)], p, ctx, f"{self.path}.input_proj_bn.{i}")
            feats.append(p.reshape(b, -1, self.hd))
        feats = jnp.concatenate(feats, axis=1).astype(jnp.float32)  # (B, A, hd)

        anchors, valid_mask = self._generate_anchors(shapes)
        features = self.enc_output_norm(v["enc_output_norm"], self.enc_output(v["enc_output"], valid_mask[None] * feats, ctx), ctx)
        enc_scores = self.enc_score_head(v["enc_score_head"], features, ctx)  # (B, A, nc)

        # top-nq query selection by max class score (capped by anchor count at
        # tiny image sizes)
        top_vals = jnp.max(enc_scores, axis=-1)
        nq = min(self.nq, top_vals.shape[1])
        _, topk_ind = jax.lax.top_k(top_vals, nq)  # (B, nq)
        top_feats = jnp.take_along_axis(features, topk_ind[..., None], axis=1)
        top_anchors = jnp.where(jnp.isinf(anchors), 1e9, anchors)[topk_ind]  # inf-safe gather
        refer = self.enc_bbox_head(v["enc_bbox_head"], top_feats, ctx) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer)
        enc_topk_scores = jnp.take_along_axis(enc_scores, topk_ind[..., None], axis=1)

        embed = top_feats
        if ctx.train:
            refer = jax.lax.stop_gradient(refer)
            embed = jax.lax.stop_gradient(embed)

        # contrastive denoising block (training with targets only)
        attn_mask = None
        dn_d = 0
        if ctx.train and ctx.targets is not None and ctx.rng is not None:
            from drone_yolo_tpu.models.rtdetr.cdn import build_cdn_group

            t = ctx.targets
            imgsz = float(shapes[0][0] * self.stride[0])  # P3 stride-8 level
            bbp = t["bboxes"].astype(jnp.float32) / imgsz  # normalized xyxy
            gt_boxes_n = jnp.concatenate([(bbp[..., :2] + bbp[..., 2:]) / 2, bbp[..., 2:] - bbp[..., :2]], axis=-1)
            cdn = build_cdn_group(
                ctx.rng, t["cls"].astype(jnp.int32), gt_boxes_n, t["mask"], self.nc, nq
            )
            dn_embed = v["denoising_class_embed"][cdn["dn_cls"]]  # (B, D, hd)
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], axis=1)
            refer = jnp.concatenate([cdn["dn_bbox_logit"], refer], axis=1)
            attn_mask = cdn["attn_mask"]
            dn_d = cdn["d"]
            ctx.aux["dn_meta"] = {k: cdn[k] for k in ("dn_cls", "dn_valid", "dn_pos", "d", "num_group")}

        refer_bbox = jax.nn.sigmoid(refer)
        dec_bboxes, dec_scores = [], []
        last_refined = None
        out = embed
        for i, layer in enumerate(self.layers):
            qp = self.query_pos_head(v["query_pos_head"], refer_bbox, ctx)
            out = layer(v["layers"][str(i)], out, refer_bbox, feats, shapes, ctx, query_pos=qp, attn_mask=attn_mask)
            bbox = self.dec_bbox_head[i](v["dec_bbox_head"][str(i)], out, ctx)
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer_bbox))
            if ctx.train:
                dec_scores.append(self.dec_score_head[i](v["dec_score_head"][str(i)], out, ctx))
                dec_bboxes.append(refined if i == 0 else jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined)))
            elif i == self.eval_idx:
                dec_scores.append(self.dec_score_head[i](v["dec_score_head"][str(i)], out, ctx))
                dec_bboxes.append(refined)
                break
            last_refined = refined
            refer_bbox = jax.lax.stop_gradient(refined) if ctx.train else refined

        dec_bboxes = jnp.stack(dec_bboxes)  # (L, B, dn+nq, 4)
        dec_scores = jnp.stack(dec_scores)
        if ctx.train:
            return dec_bboxes, dec_scores, enc_bboxes, enc_topk_scores, ctx.aux.get("dn_meta")
        # (B, nq, 4 + nc): normalized cxcywh + sigmoid scores
        return jnp.concatenate([dec_bboxes[-1], jax.nn.sigmoid(dec_scores[-1])], axis=-1), None

    def fuse_vars(self, v):
        return v  # transformer head: nothing to fold
