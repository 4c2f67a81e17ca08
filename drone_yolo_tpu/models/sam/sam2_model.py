"""SAM2: promptable image + video segmentation with a streaming memory bank.

Capability parity with `ultralytics/models/sam/modules/sam.py:105` (SAM2Model)
and `ultralytics/models/sam/predict.py:815` (SAM2VideoPredictor), re-designed
TPU-first:

* One jitted step per role (image-encode / prompted-decode / memory-conditioned
  track / memory-encode), each with STATIC shapes.
* The memory bank is padded to a fixed token count (num_maskmem spatial frames
  + max_obj_ptrs pointer tokens) with an additive validity bias, so the whole
  video runs on a single compiled track step — no per-frame recompiles.
* Host code only assembles numpy memory buffers and routes frames.

Uses the sam2_t/s/b/l Hiera configurations from the reference build
(`models/sam/build.py:68-118`).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.models.sam.modules import PromptEncoder, _SamMLP
from drone_yolo_tpu.models.sam.sam2_modules import (
    FpnNeck,
    Hiera,
    ImageEncoder,
    MemoryAttention,
    MemoryEncoder,
    SAM2MaskDecoder,
    get_1d_sine_pe,
)
from drone_yolo_tpu.nn.modules import Ctx, Module, _child_key
from drone_yolo_tpu.utils import LOGGER

NO_OBJ_SCORE = -1024.0

SAM2_CONFIGS = {
    # name: (embed_dim, num_heads, stages, global_att_blocks, window_spec, bkg)
    "sam2_t": (96, 1, (1, 2, 7, 2), (5, 7, 9), (8, 4, 14, 7), (7, 7)),
    "sam2_s": (96, 1, (1, 2, 11, 2), (7, 10, 13), (8, 4, 14, 7), (7, 7)),
    "sam2_b": (112, 2, (2, 3, 16, 3), (12, 16, 20), (8, 4, 14, 8), (14, 14)),
    "sam2_l": (144, 2, (2, 6, 36, 4), (23, 33, 43), (8, 4, 16, 8), (7, 7)),
}


class SAM2Model(Module):
    """SAM2 image/video model: Hiera encoder, SAM heads, memory attention+encoder."""

    task = "segment"

    def __init__(self, variant: str = "sam2_t", img_size: int = 1024, num_maskmem: int = 7,
                 max_obj_ptrs: int = 16, mem_dim: int = 64, hidden: int = 256):
        dim, heads, stages, glb, wins, bkg = SAM2_CONFIGS[variant]
        self.variant, self.img_size = variant, img_size
        self.num_maskmem, self.max_obj_ptrs = num_maskmem, max_obj_ptrs
        self.mem_dim, self.hidden = mem_dim, hidden
        self.sigmoid_scale, self.sigmoid_bias = 20.0, -10.0
        trunk = Hiera(embed_dim=dim, num_heads=heads, stages=stages, global_att_blocks=glb,
                      window_spec=wins, window_pos_bkg=bkg)
        self.image_encoder = ImageEncoder(
            trunk, FpnNeck(hidden, trunk.channel_list, top_down_levels=(2, 3)), scalp=1
        )
        self.embed_size = img_size // 16
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=hidden, image_embedding_size=(self.embed_size,) * 2,
            input_image_size=(img_size,) * 2, mask_in_chans=16,
        )
        self.sam_mask_decoder = SAM2MaskDecoder(dim=hidden, num_heads=8, depth=2)
        self.memory_attention = MemoryAttention(hidden, num_layers=4, mem_dim=mem_dim)
        self.memory_encoder = MemoryEncoder(out_dim=mem_dim, in_dim=hidden)
        self.obj_ptr_proj = _SamMLP(hidden, hidden, hidden, 3)
        self.names = {0: "object"}
        self.stride = np.array([16.0])
        self.nc = 1

    def init(self, key):
        v = super().init(key)
        h, d, md = 1, self.hidden, self.mem_dim
        v["no_mem_embed"] = jax.random.normal(_child_key(key, "nme"), (1, 1, d), jnp.float32) * 0.02
        v["no_mem_pos_enc"] = jax.random.normal(_child_key(key, "nmp"), (1, 1, d), jnp.float32) * 0.02
        v["maskmem_tpos_enc"] = jax.random.normal(_child_key(key, "tpe"), (self.num_maskmem, 1, md), jnp.float32) * 0.02
        v["no_obj_ptr"] = jax.random.normal(_child_key(key, "nop"), (1, d), jnp.float32) * 0.02
        return v

    # -- image encoding --------------------------------------------------------
    def forward_image(self, v, x, ctx: Ctx):
        """x (B, H, W, 3) normalized. Returns dict of s4/s8/s16 features (NHWC)
        with the high-res levels pre-projected for the decoder
        (reference sam.py:594 forward_image)."""
        out = self.image_encoder(v["image_encoder"], x, ctx)
        f4, f8, f16 = out["backbone_fpn"]
        dv = v["sam_mask_decoder"]
        hr0 = self.sam_mask_decoder.conv_s0(dv["conv_s0"], f4, ctx)
        hr1 = self.sam_mask_decoder.conv_s1(dv["conv_s1"], f8, ctx)
        return {"feat_s16": f16, "pos_s16": out["vision_pos_enc"][2], "hr0": hr0, "hr1": hr1}

    # -- SAM heads ---------------------------------------------------------------
    def forward_sam_heads(self, v, pix_feat, points, labels, hr_feats, ctx: Ctx, multimask=False):
        """pix_feat (B, h, w, C) memory-conditioned features; points (B, P, 2)
        in input-image pixels; labels (B, P). Returns (masks, ious, obj_ptr,
        obj_score_logits); masks are low-res (B, T, 4h, 4w) logits."""
        pv = v["sam_prompt_encoder"]
        b = pix_feat.shape[0]
        # SAM2 always passes boxes=None, so the reference prompt encoder
        # appends a (0, 0, label=-1) padding point (encoders.py _embed_points)
        points = jnp.concatenate([points, jnp.zeros((b, 1, 2), points.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
        sparse = self.sam_prompt_encoder.encode_points(pv, points, labels)
        h, w = self.sam_prompt_encoder.embed_size
        dense = jnp.broadcast_to(pv["no_mask"][0], (b, h, w, self.hidden))
        image_pe = self.sam_prompt_encoder.dense_pe(pv)
        masks, ious, sam_tokens, obj_logits = self.sam_mask_decoder(
            v["sam_mask_decoder"], pix_feat, image_pe, sparse, dense, ctx,
            high_res_feats=hr_feats, multimask=multimask,
        )
        is_obj = obj_logits > 0  # (B, 1)
        masks = jnp.where(is_obj[:, :, None, None], masks, NO_OBJ_SCORE)
        if multimask:
            best = jnp.argmax(ious, axis=-1)
            best_mask = jnp.take_along_axis(masks, best[:, None, None, None], axis=1)
            token = jnp.take_along_axis(sam_tokens, best[:, None, None], axis=1)[:, 0]
        else:
            best_mask = masks[:, :1]
            token = sam_tokens[:, 0]
        obj_ptr = self.obj_ptr_proj(v["obj_ptr_proj"], token, ctx)
        lam = is_obj.astype(jnp.float32)  # fixed_no_obj_ptr (hard gate)
        obj_ptr = lam * obj_ptr + (1 - lam) * v["no_obj_ptr"]
        return masks, ious, best_mask, obj_ptr, obj_logits[:, 0]

    # -- memory ----------------------------------------------------------------
    def condition_on_memory(self, v, feat_s16, pos_s16, mem_tok, mem_pos, mem_bias, n_ptr_tokens, ctx: Ctx):
        """feat_s16 (B,h,w,C); mem_tok (B, L, mem_dim) static-padded memory bank;
        mem_bias (L,) additive validity bias. Returns conditioned (B,h,w,C)."""
        b, h, w, c = feat_s16.shape
        cur = feat_s16.reshape(b, h * w, c)
        cur_pos = pos_s16.reshape(1, h * w, c)
        out = self.memory_attention(
            v["memory_attention"], cur, mem_tok, jnp.broadcast_to(cur_pos, cur.shape), mem_pos,
            (h, w), ctx, key_bias=mem_bias, n_obj_tokens=n_ptr_tokens,
        )
        return out.reshape(b, h, w, c)

    def encode_memory(self, v, feat_s16, high_res_mask_logits, ctx: Ctx):
        """feat_s16 (B,h,w,C); high_res_mask_logits (B, H, W, 1) at image res.
        Returns (mem_feat (B,h,w,mem_dim), mem_pos (h,w,mem_dim))."""
        m = jax.nn.sigmoid(high_res_mask_logits) * self.sigmoid_scale + self.sigmoid_bias
        return self.memory_encoder(v["memory_encoder"], feat_s16, m, ctx)

    # -- compile-check forward ---------------------------------------------------
    def __call__(self, v, x, ctx: Ctx):
        """Single-image forward with a center point (no memory): reproduces SAM
        behavior on images (reference: num_maskmem=0 path, sam.py:637)."""
        feats = self.forward_image(v, x, ctx)
        b = x.shape[0]
        pix = feats["feat_s16"] + v["no_mem_embed"][0]
        pts = jnp.full((b, 1, 2), self.img_size / 2, jnp.float32)
        lbl = jnp.ones((b, 1), jnp.int32)
        masks, ious, best, ptr, score = self.forward_sam_heads(
            v, pix, pts, lbl, [feats["hr0"], feats["hr1"]], ctx, multimask=True
        )
        return masks, ious


def _preprocess(img, size):
    """Square resize + ImageNet mean/std normalize (reference SAM2 transforms)."""
    import cv2

    im = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR).astype(np.float32)
    im = (im / 255.0 - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
        [0.229, 0.224, 0.225], np.float32
    )
    return im


class SAM2:
    """SAM2 image facade: point/box-promptable segmentation (no memory)."""

    def __init__(self, model: str = "sam2_t", img_size: int = 1024):
        self.model = SAM2Model(model if model in SAM2_CONFIGS else "sam2_t", img_size=img_size)
        self.model.set_paths("model")
        self.variables = None
        self._jit = {}
        self._feats = None

    def ensure_variables(self, seed: int = 0):
        if self.variables is None:
            LOGGER.info(f"initializing {self.model.variant} (random weights; convert official ckpts for real masks)")
            self.variables = self.model.init(jax.random.PRNGKey(seed))
        return self.variables

    def set_image(self, img):
        v = self.ensure_variables()
        s = self.model.img_size
        x = jnp.asarray(_preprocess(img, s)[None])
        if "enc" not in self._jit:
            self._jit["enc"] = jax.jit(
                lambda v, x: self.model.forward_image(v, x, Ctx(train=False, dtype=jnp.float32))
            )
        self._feats = self._jit["enc"](v, x)
        self._orig_shape = img.shape[:2]
        return self

    def predict_prompts(self, points=None, labels=None, box=None, multimask=True):
        assert self._feats is not None, "call set_image first"
        s = self.model.img_size
        oh, ow = self._orig_shape
        pts, lbl = [], []
        if points is not None:
            p = np.asarray(points, np.float32).reshape(-1, 2) * [s / ow, s / oh]
            pts.append(p)
            lbl.append(np.asarray(labels if labels is not None else np.ones(len(p)), np.int32))
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2) * [s / ow, s / oh]
            pts.append(bx)
            lbl.append(np.asarray([2, 3], np.int32))
        if not pts:
            pts, lbl = [np.array([[s / 2, s / 2]], np.float32)], [np.array([1], np.int32)]
        points_a = jnp.asarray(np.concatenate(pts))[None]
        labels_a = jnp.asarray(np.concatenate(lbl))[None]
        key = ("dec", points_a.shape[1], multimask)
        if key not in self._jit:

            def fn(v, feats, p, l):
                ctx = Ctx(train=False, dtype=jnp.float32)
                pix = feats["feat_s16"] + v["no_mem_embed"][0]
                return self.model.forward_sam_heads(
                    v, pix, p, l, [feats["hr0"], feats["hr1"]], ctx, multimask=multimask
                )

            self._jit[key] = jax.jit(fn)
        masks, ious, _, _, _ = self._jit[key](self.variables, self._feats, points_a, labels_a)
        import cv2

        m = np.asarray(masks)[0].astype(np.float32)
        out = np.stack([cv2.resize(mm, (ow, oh), interpolation=cv2.INTER_LINEAR) for mm in m]) > 0
        return out, np.asarray(ious)[0]

    def __call__(self, source, points=None, labels=None, bboxes=None, multimask=True):
        self.set_image(source)
        return self.predict_prompts(points=points, labels=labels, box=bboxes, multimask=multimask)


class SAM2VideoPredictor:
    """Streaming video predictor with a static-padded memory bank
    (reference predict.py:815 SAM2VideoPredictor, re-designed for one XLA
    compile across the whole video).

    Usage:
        p = SAM2VideoPredictor("sam2_t", img_size=256)
        state = p.init_state(frames)                  # list of HWC uint8
        p.add_points(state, frame_idx=0, obj_id=1, points=[[x, y]])
        for frame_idx, masks in p.propagate(state):   # masks: {obj_id: HxW bool}
            ...
    """

    def __init__(self, model: str = "sam2_t", img_size: int = 256, variables=None):
        self.model = SAM2Model(model if model in SAM2_CONFIGS else "sam2_t", img_size=img_size)
        self.model.set_paths("model")
        self.variables = variables
        self._jit = {}

    def ensure_variables(self, seed: int = 0):
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(seed))
        return self.variables

    # -- state -------------------------------------------------------------------
    def init_state(self, frames):
        self.ensure_variables()
        return {
            "frames": list(frames),
            "num_frames": len(frames),
            "feat_cache": {},
            # per obj_id: {"cond": {fidx: out}, "non_cond": {fidx: out}}
            "objs": {},
            "orig_shape": frames[0].shape[:2],
        }

    def _encode_frame(self, state, idx):
        if idx in state["feat_cache"]:
            return state["feat_cache"][idx]
        if "enc" not in self._jit:
            self._jit["enc"] = jax.jit(
                lambda v, x: self.model.forward_image(v, x, Ctx(train=False, dtype=jnp.float32))
            )
        x = jnp.asarray(_preprocess(state["frames"][idx], self.model.img_size)[None])
        feats = jax.tree.map(np.asarray, self._jit["enc"](self.variables, x))
        state["feat_cache"][idx] = feats
        # keep the cache bounded: only recent frames are revisited
        if len(state["feat_cache"]) > 8:
            oldest = min(k for k in state["feat_cache"] if k != idx)
            state["feat_cache"].pop(oldest, None)
        return feats

    # -- prompts -------------------------------------------------------------------
    def add_points(self, state, frame_idx, obj_id, points=None, labels=None, box=None):
        """Add point/box prompts on a conditioning frame. Returns the frame mask
        (H, W) bool in original frame space."""
        s = self.model.img_size
        oh, ow = state["orig_shape"]
        pts, lbl = [], []
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2) * [s / ow, s / oh]
            pts.append(bx)
            lbl.append(np.array([2, 3], np.int32))
        if points is not None:
            p = np.asarray(points, np.float32).reshape(-1, 2) * [s / ow, s / oh]
            pts.append(p)
            lbl.append(np.asarray(labels if labels is not None else np.ones(len(p)), np.int32))
        points_a = np.concatenate(pts)[None]
        labels_a = np.concatenate(lbl)[None]

        feats = self._encode_frame(state, frame_idx)
        key = ("cond", points_a.shape[1])
        if key not in self._jit:

            def fn(v, feats, p, l):
                ctx = Ctx(train=False, dtype=jnp.float32)
                pix = feats["feat_s16"] + v["no_mem_embed"][0]  # directly_add_no_mem_embed
                masks, ious, best, ptr, score = self.model.forward_sam_heads(
                    v, pix, p, l, [feats["hr0"], feats["hr1"]], ctx, multimask=True
                )
                hi = jax.image.resize(best[:, 0, :, :, None], (1, self.model.img_size, self.model.img_size, 1), "bilinear")
                mem_feat, mem_pos = self.model.encode_memory(v, feats["feat_s16"], hi, ctx)
                return best, ptr, score, mem_feat, mem_pos, hi

            self._jit[key] = jax.jit(fn)
        best, ptr, score, mem_feat, mem_pos, hi = self._jit[key](
            self.variables, feats, jnp.asarray(points_a), jnp.asarray(labels_a)
        )
        mask_orig = self._to_orig(np.asarray(best)[0, 0], state)
        out = {
            "mem_feat": np.asarray(mem_feat)[0],  # (h, w, mem_dim)
            "mem_pos": np.asarray(mem_pos),
            "obj_ptr": np.asarray(ptr)[0],
            "score": float(np.asarray(score)[0]),
            "mask_orig": mask_orig,
        }
        state["objs"].setdefault(obj_id, {"cond": {}, "non_cond": {}})["cond"][frame_idx] = out
        return mask_orig

    # -- memory bank assembly (host) ----------------------------------------------
    def _assemble_bank(self, state, obj, frame_idx):
        md = self.model.mem_dim
        hw = self.model.embed_size**2
        n_mem = self.model.num_maskmem
        n_ptr = self.model.max_obj_ptrs
        split = self.model.hidden // md
        L_sp, L_ptr = n_mem * hw, n_ptr * split
        tok = np.zeros((L_sp + L_ptr, md), np.float32)
        pos = np.zeros((L_sp + L_ptr, md), np.float32)
        bias = np.full((L_sp + L_ptr,), -1e9, np.float32)
        v = self.variables
        tpos = np.asarray(v["maskmem_tpos_enc"])  # (n_mem, 1, md)

        # spatial memories: cond frames at t_pos 0, then previous (n_mem-1) frames
        entries = []
        for t, out in obj["cond"].items():
            entries.append((0, out))
        for t_pos in range(1, n_mem):
            t_rel = n_mem - t_pos
            prev = frame_idx - t_rel
            out = obj["non_cond"].get(prev)
            if out is not None:
                entries.append((t_pos, out))
        entries = entries[:n_mem]
        for slot, (t_pos, out) in enumerate(entries):
            sl = slice(slot * hw, (slot + 1) * hw)
            tok[sl] = out["mem_feat"].reshape(hw, md)
            pos[sl] = out["mem_pos"].reshape(hw, md) + tpos[n_mem - t_pos - 1]
            bias[sl] = 0.0

        # object pointers: cond frames (past only) + up to n_ptr-1 recent frames
        ptrs = [(abs(frame_idx - t), o["obj_ptr"]) for t, o in obj["cond"].items() if t <= frame_idx]
        for t_diff in range(1, n_ptr):
            t = frame_idx - t_diff
            if t < 0:
                break
            o = obj["non_cond"].get(t)
            if o is not None:
                ptrs.append((t_diff, o["obj_ptr"]))
        ptrs = ptrs[:n_ptr]
        if ptrs:
            t_diff_max = max(1, min(state["num_frames"], n_ptr) - 1)
            for i, (td, ptr) in enumerate(ptrs):
                pe = np.asarray(get_1d_sine_pe(jnp.asarray([td / t_diff_max]), md))[0]
                sl = slice(L_sp + i * split, L_sp + (i + 1) * split)
                tok[sl] = ptr.reshape(split, md)
                pos[sl] = pe  # same tpos for each split token
                bias[sl] = 0.0
        return tok[None], pos[None], bias, L_ptr

    # -- propagation ----------------------------------------------------------------
    def propagate(self, state, start=None, reverse=False):
        """Generator over frames: yields (frame_idx, {obj_id: (H, W) bool})."""
        assert state["objs"], "add prompts with add_points first"
        cond_idx = min(min(o["cond"]) for o in state["objs"].values())
        start = cond_idx if start is None else start
        order = range(start, state["num_frames"]) if not reverse else range(start, -1, -1)
        if "track" not in self._jit:

            def fn(v, feats, tok, pos, bias):
                ctx = Ctx(train=False, dtype=jnp.float32)
                pix = self.model.condition_on_memory(
                    v, feats["feat_s16"], feats["pos_s16"], tok, pos, bias,
                    self.model.max_obj_ptrs * (self.model.hidden // self.model.mem_dim), ctx,
                )
                pts = jnp.zeros((1, 1, 2), jnp.float32)
                lbl = -jnp.ones((1, 1), jnp.int32)
                masks, ious, best, ptr, score = self.model.forward_sam_heads(
                    v, pix, pts, lbl, [feats["hr0"], feats["hr1"]], ctx, multimask=False
                )
                hi = jax.image.resize(best[:, 0, :, :, None], (1, self.model.img_size, self.model.img_size, 1), "bilinear")
                mem_feat, mem_pos = self.model.encode_memory(v, feats["feat_s16"], hi, ctx)
                return best, ptr, score, mem_feat, mem_pos

            self._jit["track"] = jax.jit(fn)

        for idx in order:
            feats = None
            frame_masks = {}
            for obj_id, obj in state["objs"].items():
                if idx in obj["cond"]:
                    # conditioning frame: mask already produced by add_points;
                    # re-derive it from stored memory features for output
                    frame_masks[obj_id] = self._mask_from_mem(obj["cond"][idx], state)
                    continue
                feats = feats or self._encode_frame(state, idx)
                tok, pos, bias, n_ptr_tok = self._assemble_bank(state, obj, idx)
                best, ptr, score, mem_feat, mem_pos = self._jit["track"](
                    self.variables, feats, jnp.asarray(tok), jnp.asarray(pos), jnp.asarray(bias)
                )
                obj["non_cond"][idx] = {
                    "mem_feat": np.asarray(mem_feat)[0],
                    "mem_pos": np.asarray(mem_pos),
                    "obj_ptr": np.asarray(ptr)[0],
                    "score": float(np.asarray(score)[0]),
                }
                # bound host memory: drop entries older than the memory horizon
                horizon = max(self.model.num_maskmem, self.model.max_obj_ptrs)
                for old in [t for t in obj["non_cond"] if abs(idx - t) > horizon]:
                    obj["non_cond"].pop(old)
                frame_masks[obj_id] = self._to_orig(np.asarray(best)[0, 0], state)
            yield idx, frame_masks

    def _mask_from_mem(self, out, state):
        """Reconstruct the stored conditioning-frame mask at original resolution."""
        return out.get("mask_orig", np.zeros(state["orig_shape"], bool))

    def _to_orig(self, mask_logits, state):
        import cv2

        oh, ow = state["orig_shape"]
        return cv2.resize(mask_logits.astype(np.float32), (ow, oh), interpolation=cv2.INTER_LINEAR) > 0
