"""Contrastive denoising (CDN) group generation for RT-DETR training.

Capability parity with `ultralytics/models/utils/ops.py get_cdn_group`: each
group carries one positive (lightly noised) and one negative (heavily noised)
copy of every GT; an attention mask stops information flow between groups and
from the denoising part into the matching queries.

Static-shape version: GT arrive padded to max_boxes M, so the dn block is
exactly 2 * num_group * M queries per image — one compile, masked where GT
slots are padding.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def build_cdn_group(rng, gt_cls, gt_boxes_n, gt_mask, nc: int, num_queries: int, num_dn: int = 100, cls_noise: float = 0.5, box_noise: float = 1.0):
    """Build the denoising block.

    Args:
        gt_cls (B, M) int; gt_boxes_n (B, M, 4) normalized cxcywh; gt_mask (B, M).

    Returns dict with dn_cls (B, D), dn_bbox_logit (B, D, 4), dn_valid (B, D),
    dn_pos (B, D) 1 where the slot is a positive copy, attn_mask (D+Q, D+Q) bool
    (True = blocked), num_group.
    """
    b, m = gt_cls.shape
    num_group = max(num_dn // max(m, 1), 1)
    d = 2 * num_group * m  # pos+neg per group

    reps = 2 * num_group
    cls_r = jnp.tile(gt_cls.astype(jnp.int32), (1, reps))  # (B, D)
    box_r = jnp.tile(gt_boxes_n, (1, reps, 1))  # (B, D, 4)
    valid = jnp.tile(gt_mask.astype(jnp.float32), (1, reps))
    # slot layout per group: [pos(M), neg(M)]
    pos_pattern = jnp.tile(
        jnp.concatenate([jnp.ones((m,), jnp.float32), jnp.zeros((m,), jnp.float32)]), (num_group,)
    )
    dn_pos = jnp.broadcast_to(pos_pattern, (b, d)) * valid

    k_cls, k_flip, k_box, k_sign = jax.random.split(rng, 4)
    # label noise: flip a fraction of labels to random classes (both pos & neg)
    flip = jax.random.uniform(k_flip, (b, d)) < (cls_noise * 0.5)
    rand_cls = jax.random.randint(k_cls, (b, d), 0, nc)
    dn_cls = jnp.where(flip, rand_cls, cls_r)

    # box noise in units of half-extents; neg copies pushed further (1..2x)
    wh = box_r[..., 2:]
    half = jnp.concatenate([wh, wh], axis=-1) * 0.5  # (B, D, 4)
    u = jax.random.uniform(k_box, (b, d, 4))
    sign = jnp.where(jax.random.uniform(k_sign, (b, d, 4)) < 0.5, -1.0, 1.0)
    mag = jnp.where(dn_pos[..., None] > 0, u, 1.0 + u)  # neg: 1..2
    # xyxy-space shift like the reference (convert, shift, convert back)
    xy, bwh = box_r[..., :2], box_r[..., 2:]
    xyxy = jnp.concatenate([xy - bwh / 2, xy + bwh / 2], axis=-1)
    xyxy = xyxy + sign * mag * half * box_noise
    xyxy = jnp.clip(xyxy, 0.0, 1.0)
    noised = jnp.concatenate([(xyxy[..., :2] + xyxy[..., 2:]) / 2, jnp.abs(xyxy[..., 2:] - xyxy[..., :2])], axis=-1)
    eps = 1e-4
    noised = jnp.clip(noised, eps, 1 - eps)
    dn_bbox_logit = jnp.log(noised / (1 - noised))

    # attention mask (True = blocked): matching queries never attend to dn;
    # dn groups are mutually blind (reference get_cdn_group mask layout)
    total = d + num_queries
    mask = np.zeros((total, total), bool)
    mask[d:, :d] = True  # matching part cannot see dn
    gsz = 2 * m
    for g in range(num_group):
        s, e = g * gsz, (g + 1) * gsz
        mask[s:e, :s] = True
        mask[s:e, e:d] = True
    return {
        "dn_cls": dn_cls,
        "dn_bbox_logit": dn_bbox_logit,
        "dn_valid": valid,
        "dn_pos": dn_pos,
        "attn_mask": jnp.asarray(mask),
        "num_group": num_group,
        "d": d,
    }
