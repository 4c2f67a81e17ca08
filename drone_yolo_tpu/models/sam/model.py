"""SAM model + facade (reference models/sam/model.py, modules/sam.py SAMModel)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from drone_yolo_tpu.models.sam.modules import ImageEncoderViT, MaskDecoder, PromptEncoder
from drone_yolo_tpu.nn.modules import Ctx, Module, _child_key
from drone_yolo_tpu.utils import LOGGER

SAM_CONFIGS = {
    # name: (dim, depth, heads, global_idx)
    "sam_b": (768, 12, 12, (2, 5, 8, 11)),
    "sam_l": (1024, 24, 16, (5, 11, 17, 23)),
    "sam_h": (1280, 32, 16, (7, 15, 23, 31)),
}


class SAMModel(Module):
    """Promptable segmentation model: image encoder + prompt encoder + mask decoder."""

    task = "segment"

    def __init__(self, variant: str = "sam_b", img_size: int = 1024):
        dim, depth, heads, glb = SAM_CONFIGS[variant]
        self.variant = variant
        self.img_size = img_size
        self.image_encoder = ImageEncoderViT(img_size=img_size, dim=dim, depth=depth, num_heads=heads, global_idx=glb)
        self.prompt_encoder = PromptEncoder(
            embed_dim=256, image_embedding_size=(img_size // 16, img_size // 16), input_image_size=(img_size, img_size)
        )
        self.mask_decoder = MaskDecoder(dim=256)
        self.names = {0: "object"}
        self.stride = np.array([16.0])
        self.nc = 1

    def encode_image(self, v, x, ctx: Ctx):
        return self.image_encoder(v["image_encoder"], x, ctx)

    def predict_masks(self, v, image_embed, points, labels, ctx: Ctx, multimask: bool = True):
        """image_embed (B, 64, 64, 256); points (B, P, 2) pixels; labels (B, P)."""
        pv = v["prompt_encoder"]
        sparse = self.prompt_encoder.encode_points(pv, points, labels)
        b = image_embed.shape[0]
        h, w = self.prompt_encoder.embed_size
        dense = jnp.broadcast_to(pv["no_mask"][0], (b, h, w, 256))
        image_pe = self.prompt_encoder.dense_pe(pv)
        masks, iou = self.mask_decoder(v["mask_decoder"], image_embed, image_pe, sparse, dense, ctx)
        if multimask:
            return masks[:, 1:], iou[:, 1:]
        return masks[:, :1], iou[:, :1]

    def __call__(self, v, x, ctx: Ctx):
        """Whole-image forward with a center point prompt (for compile checks)."""
        emb = self.encode_image(v, x, ctx)
        b = x.shape[0]
        pts = jnp.full((b, 1, 2), self.img_size / 2, jnp.float32)
        lbl = jnp.ones((b, 1), jnp.int32)
        return self.predict_masks(v, emb, pts, lbl, ctx)


class SAM:
    """SAM facade (reference models/sam/model.py): point/box-promptable segmentation.

    Zero-egress note: official SAM weights are torch checkpoints; load them via
    `drone_yolo_tpu.utils.torch_convert` once available locally. Random-weight
    models exercise the full compiled pipeline (shape/latency checks).
    """

    def __init__(self, model: str = "sam_b", img_size: int = 1024):
        self.model = SAMModel(model if model in SAM_CONFIGS else "sam_b", img_size=img_size)
        self.model.set_paths("model")
        self.variables = None
        self._embed_cache = None
        self._jit = {}

    def ensure_variables(self, seed: int = 0):
        if self.variables is None:
            LOGGER.info(f"initializing {self.model.variant} (random weights; convert official ckpts for real masks)")
            self.variables = self.model.init(jax.random.PRNGKey(seed))
        return self.variables

    # reference SAMModel pixel normalization (modules/sam.py pixel_mean/std)
    PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
    PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)

    def set_image(self, img):
        """Embed an image once (HWC uint8 RGB); prompts reuse the embedding.

        Reference preprocessing (ResizeLongestSide + pad + mean/std normalize):
        long side resized to img_size, bottom/right padded to square."""
        import cv2

        v = self.ensure_variables()
        s = self.model.img_size
        oh, ow = img.shape[:2]
        r = s / max(oh, ow)
        nh, nw = int(round(oh * r)), int(round(ow * r))
        im = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR).astype(np.float32)
        im = (im - self.PIXEL_MEAN) / self.PIXEL_STD
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = im
        x = jnp.asarray(canvas[None])
        if "encode" not in self._jit:
            self._jit["encode"] = jax.jit(lambda v, x: self.model.encode_image(v, x, Ctx(train=False, dtype=jnp.float32)))
        self._embed_cache = self._jit["encode"](v, x)
        self._orig_shape = (oh, ow)
        self._resized_shape = (nh, nw)
        return self

    def predict_prompts(self, points=None, labels=None, box=None, multimask: bool = True):
        """Predict masks for point/box prompts on the set image.

        Returns (masks (T, H, W) bool in original image space, iou (T,))."""
        assert self._embed_cache is not None, "call set_image first"
        s = self.model.img_size
        oh, ow = self._orig_shape
        r = s / max(oh, ow)  # uniform long-side scale (reference ResizeLongestSide)
        pts, lbl = [], []
        if points is not None:
            p = np.asarray(points, np.float32).reshape(-1, 2) * r
            pts.append(p)
            lbl.append(np.asarray(labels if labels is not None else np.ones(len(p)), np.int32))
        if box is not None:
            bx = np.asarray(box, np.float32).reshape(2, 2) * r
            pts.append(bx)
            lbl.append(np.asarray([2, 3], np.int32))
        if not pts:
            pts = [np.array([[s / 2, s / 2]], np.float32)]
            lbl = [np.array([1], np.int32)]
        if box is None:
            # reference pads points with (0, 0, label=-1) when no box is given
            pts.append(np.zeros((1, 2), np.float32))
            lbl.append(-np.ones(1, np.int32))
        points_a = jnp.asarray(np.concatenate(pts))[None]
        labels_a = jnp.asarray(np.concatenate(lbl))[None]

        key = ("dec", points_a.shape[1], multimask)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                lambda v, e, p, l: self.model.predict_masks(v, e, p, l, Ctx(train=False, dtype=jnp.float32), multimask=multimask)
            )
        masks, iou = self._jit[key](self.variables, self._embed_cache, points_a, labels_a)
        import cv2

        m = np.asarray(masks)[0].astype(np.float32)  # (T, 256, 256) logits on padded square
        # crop away the pad region, then resize to the original frame
        mh, mw = m.shape[1:]
        nh, nw = self._resized_shape
        ch, cw = max(1, round(mh * nh / s)), max(1, round(mw * nw / s))
        out = np.stack([cv2.resize(mm[:ch, :cw], (ow, oh), interpolation=cv2.INTER_LINEAR) for mm in m]) > 0
        return out, np.asarray(iou)[0]

    def __call__(self, source, points=None, labels=None, bboxes=None, multimask: bool = True):
        self.set_image(source)
        return self.predict_prompts(points=points, labels=labels, box=bboxes, multimask=multimask)
