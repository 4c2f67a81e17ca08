"""On-device training augmentation: mosaic + affine + HSV + flip inside the jitted step.

The BASELINE.json north-star asks for the reference's host-side loader chain
(mosaic, affine jitter, HSV, normalize — `ultralytics/data/augment.py:490,952,1303`)
to become "a fused on-device preprocessing kernel chain". This module is that
chain, as an opt-in fast path (`device_aug=True`): the host ships letterboxed
UN-augmented uint8 images (decode + letterbox + collate only), and every
random transform runs on the TPU inside the train step.

TPU-first design decisions:

* **No canvas materialization.** The reference builds a (2S, 2S) mosaic canvas
  then warps it down to S (`augment.py:658`, RandomPerspective border=-S/2).
  A (B, 2S, 2S, 3) fp32 canvas at B=128, S=640 would be 2.5 GB of HBM. Since
  the default affine is scale+translate only (degrees/shear/perspective all 0
  in default.yaml), the warp is `jax.image.scale_and_translate` — a LINEAR
  map — so resize(canvas) == Σ_k resize(quadrant_k zero-embedded), and each
  term is just the source image with a shifted translation. Four separable
  S→S resizes (each a pair of small matmul contractions, MXU-friendly),
  exact to the canvas formulation, zero canvas memory. Uncovered output
  (scale < 1) gets the reference's gray 114 via a coverage-weighted fill
  computed with one extra single-channel resize.
* **Mosaic companions come from the batch** (rolled indices) instead of the
  host-side decoded-image buffer — the device has no dataset to sample from.
  Distribution-wise this is in-batch mosaic (companions are the 3 next
  samples of the shuffled batch); the host path keeps reference buffer
  semantics (`data/base.py:176`).
* **Per-step determinism independent of host state**: all randomness derives
  from `fold_in(seed, step)`, so a resumed run continues the exact stream and
  worker count can never change results (stronger than the reference's
  per-worker seeding).
* Degenerate-box filtering is the reference's box_candidates
  (`augment.py:1280`: w,h > 2px, area ratio > 0.1, aspect < 100) as a mask
  update — shapes stay static at 4M (mosaic) / M (closed) GT slots.

Scope: detect, segment, and pose tasks. Segment warps the overlap-index mask
(B, S/r, S/r) with NEAREST sampling (instance IDs cannot be interpolated;
the reference instead warps polygons analytically and re-rasterizes —
equivalent up to <=1 px boundary jitter at mask_ratio resolution), with
companion IDs offset to their 4M slot group. Pose applies the affine to
keypoint coordinates, zeroes visibility outside the frame (reference
apply_keypoints, augment.py:1124), and swaps left/right identities via
flip_idx on horizontal flip. Under scale+translate-only affines the
axis-aligned box transform is EXACT (min/max commutes with a monotone linear
map), so segment boxes need no polygon-extreme recomputation. Device mixup
(beta(32,32) blend of two augmented samples + slot concat) is supported for
detect/pose; segment+mixup falls back to host aug (an overlap-index mask
cannot represent instances from two blended images). OBB keeps the host path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRAY = 114.0


# ---------------------------------------------------------------------------
# HSV round-trip (cv2 conventions: H in [0, 180), S/V in [0, 255])
# ---------------------------------------------------------------------------
def rgb_to_hsv(rgb):
    """RGB (0..255) -> HSV with cv2 conventions: H in [0, 180), S/V in [0, 255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    d = maxc - minc
    safe = jnp.where(d == 0, 1.0, d)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(d == 0, 0.0, (h / 6.0) % 1.0) * 180.0
    s = jnp.where(maxc == 0, 0.0, d / jnp.where(maxc == 0, 1.0, maxc)) * 255.0
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv):
    """HSV (cv2 conventions) -> RGB in 0..255; inverse of rgb_to_hsv."""
    h, s, v = hsv[..., 0] / 180.0 * 6.0, hsv[..., 1] / 255.0, hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _weights(a, t, s_in, out_s):
    """(out_s, s_in) 2-tap bilinear weights for out(o) = in((o - t)/a), zero
    outside the input domain — NO edge renormalization.

    jax.image.scale_and_translate renormalizes kernel weights at the input
    boundary, which breaks the sum-of-quadrants linearity at mosaic seams.
    The raw 2-tap kernel is exactly cv2.warpAffine INTER_LINEAR semantics:
    taps outside the source contribute nothing here, and the caller blends
    gray 114 by the complementary coverage — identical to borderValue=114.
    Index-space pixel mapping (no half-pixel offset), matching the affine
    applied to the boxes.
    """
    src = (jnp.arange(out_s, dtype=jnp.float32) - t) / a
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - jnp.arange(s_in, dtype=jnp.float32)[None, :]))


def _warp(im, a, tyx, out_s, q=None, canvas=None):
    """Warp one (S, S, C) image: two separable weight contractions (MXU-friendly).

    When `q` (the quadrant's placement offset on the virtual canvas, (qy, qx))
    and `canvas` (canvas extent) are given, source pixels whose canvas
    coordinate q+p falls outside [0, canvas) are masked out of the kernel —
    exactly the reference's crop of mosaic quadrants at the 2S canvas boundary
    (`ultralytics/data/augment.py:658-688` keeps only the in-canvas part).
    """
    wy = _weights(a, tyx[0], im.shape[0], out_s)
    wx = _weights(a, tyx[1], im.shape[1], out_s)
    if q is not None:
        py = jnp.arange(im.shape[0], dtype=jnp.float32) + q[0]
        px = jnp.arange(im.shape[1], dtype=jnp.float32) + q[1]
        wy = wy * ((py >= 0) & (py < canvas)).astype(wy.dtype)[None, :]
        wx = wx * ((px >= 0) & (px < canvas)).astype(wx.dtype)[None, :]
    tmp = jnp.einsum("oy,yxc->oxc", wy, im)
    return jnp.einsum("px,oxc->opc", wx, tmp)


def _cover(a, tyx, s_in, out_s, q=None, canvas=None):
    """(out_s, out_s, 1) total kernel mass — separable, no image read.

    Must apply the same canvas-boundary mask as `_warp` so cropped quadrant
    regions fall back to the gray-114 fill (reference: the canvas is
    pre-filled with 114 where no quadrant lands).
    """
    wy = _weights(a, tyx[0], s_in, out_s)
    wx = _weights(a, tyx[1], s_in, out_s)
    if q is not None:
        py = jnp.arange(s_in, dtype=jnp.float32) + q[0]
        px = jnp.arange(s_in, dtype=jnp.float32) + q[1]
        wy = wy * ((py >= 0) & (py < canvas)).astype(wy.dtype)[None, :]
        wx = wx * ((px >= 0) & (px < canvas)).astype(wx.dtype)[None, :]
    return (wy.sum(1)[:, None] * wx.sum(1)[None, :])[..., None]


def _warp_ids(ids, a, t, q, ratio, sf, canvas):
    """NEAREST warp of one (hm, wm) instance-ID map through the quadrant
    placement + output affine (IDs cannot be bilinearly interpolated).

    Output mask pixel m sits at image coord m*ratio; `t` is the quadrant's
    SHIFTED translation (as fed to _warp: out(o) = src((o - t)/a) in
    quadrant-local image coords), so the local source is (m*ratio - t)/a,
    sampled at round(./ratio). Sources outside the quadrant or outside the
    2S canvas (the reference's crop; canvas coord = local + q) return 0."""
    hm, wm = ids.shape
    del sf

    def src(m_len, tt, qq):
        local = (jnp.arange(m_len, dtype=jnp.float32) * ratio - tt) / a
        sm = jnp.round(local / ratio).astype(jnp.int32)
        valid = (sm >= 0) & (sm < m_len) & (local + qq >= 0) & (local + qq < canvas)
        return jnp.clip(sm, 0, m_len - 1), valid

    sy, vy = src(hm, t[0], q[0])
    sx, vx = src(wm, t[1], q[1])
    g = jnp.take(jnp.take(ids, sy, axis=0), sx, axis=1)
    return jnp.where(vy[:, None] & vx[None, :], g, 0)


def _box_candidates(w1, h1, w2, h2, area_thr=0.1, wh_thr=2.0, ar_thr=100.0, eps=1e-16):
    """reference augment.py box_candidates on static tensors."""
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def device_augment(batch, rng, hyp: dict, mosaic_on: bool):
    """Apply mosaic(+affine)+HSV+flip on device. Returns a new batch dict with
    img as float32 in [0, 1] and (when mosaic_on) GT slots expanded to 4M.

    `hyp` is a plain-float dict (trace-time constants): mosaic, scale,
    translate, hsv_h, hsv_s, hsv_v, fliplr, flipud.
    """
    img = batch["img"].astype(jnp.float32)  # (B, S, S, 3) in 0..255
    cls, boxes, mask = batch["cls"], batch["bboxes"].astype(jnp.float32), batch["mask"]
    kpts = batch.get("keypoints")  # (B, M, K, 3) pixel xy + visibility (pose)
    om = batch.get("masks")  # (B, S/r, S/r) int overlap instance-ID map (segment)
    b, s = img.shape[0], img.shape[1]
    m_slots = cls.shape[1]
    sf = float(s)
    if om is not None:
        om = om.astype(jnp.int32)
        ratio = s // om.shape[1]
    r_sc, r_tr, r_sel, r_hsv, r_fl, r_fu, r_ctr, r_mx, r_mxs = jax.random.split(rng, 9)

    # per-sample affine params (reference RandomPerspective:952 with
    # degrees/shear/perspective = 0): x' = a*(x - cx) + T,
    # T ~ U(0.5-translate, 0.5+translate) * S, a ~ U(1-scale, 1+scale)
    a = jax.random.uniform(r_sc, (b,), minval=1.0 - hyp["scale"], maxval=1.0 + hyp["scale"])
    t = jax.random.uniform(
        r_tr, (b, 2), minval=(0.5 - hyp["translate"]) * sf, maxval=(0.5 + hyp["translate"]) * sf
    )  # (ty, tx)

    if mosaic_on:
        # mosaic center jitter (reference _mosaic4: yc, xc ~ int U(S/2, 3S/2)
        # on the 2S canvas, augment.py:658): quadrant k's placement offset is
        # offs[k] + c with c = (yc, xc) - S ~ U(-jS, jS), j = mosaic_center
        # (0.5 = reference). Integer like the reference's int() draw. The
        # canvas -> output affine keeps its fixed center S (RandomPerspective's
        # C translation is -canvas/2); the jitter lives in the PLACEMENT, and
        # quadrant parts falling outside the 2S canvas are cropped (masked
        # kernel columns in _warp/_cover), exactly the reference's crop.
        jit_f = float(hyp.get("mosaic_center", 0.5))
        ctr = jnp.round(jax.random.uniform(r_ctr, (b, 2), minval=-jit_f * sf, maxval=jit_f * sf))
        sel = jax.random.uniform(r_sel, (b,)) < hyp["mosaic"]
        offs = [(0.0, 0.0), (0.0, sf), (sf, 0.0), (sf, sf)]  # (oy, ox) per quadrant

        quads = []  # per-quadrant (translation, placement) after sel gating
        for k in range(4):
            oy, ox = offs[k]
            # mosaic: embedded at (oy, ox) + ctr on a canvas centered at S
            qk = jnp.stack([oy + ctr[:, 0], ox + ctr[:, 1]], 1)
            t_mos = jnp.stack([a * (qk[:, 0] - sf) + t[:, 0], a * (qk[:, 1] - sf) + t[:, 1]], 1)
            # plain: own image centered (offset S/2); companions contribute 0.
            # S/2 placement can never leave the canvas, so the mask is inert
            t_pl = jnp.stack([a * (-sf / 2) + t[:, 0], a * (-sf / 2) + t[:, 1]], 1)
            quads.append((
                jnp.where(sel[:, None], t_mos, t_pl),
                jnp.where(sel[:, None], qk, jnp.full((b, 2), sf / 2)),
            ))

        total = None
        cover = None
        for k, (tk, qsel) in enumerate(quads):
            src = jnp.roll(img, -k, axis=0) if k else img
            out = jax.vmap(_warp, in_axes=(0, 0, 0, None, 0, None))(src, a, tk, s, qsel, 2.0 * sf)
            cov = jax.vmap(_cover, in_axes=(0, 0, None, None, 0, None))(a, tk, s, s, qsel, 2.0 * sf)
            if k:
                out = jnp.where(sel[:, None, None, None], out, 0.0)
                cov = jnp.where(sel[:, None, None, None], cov, 0.0)
            total = out if total is None else total + out
            cover = cov if cover is None else cover + cov
        img_out = total + GRAY * (1.0 - cover)

        if om is not None:
            # overlap-ID map: nearest-warp each quadrant, companion IDs offset
            # to their slot group (slot k*M + (id-1) after the label concat);
            # quadrants are disjoint on the canvas so first-nonzero wins
            out_ids = jnp.zeros_like(om)
            for k, (tk, qsel) in enumerate(quads):
                ids = jnp.roll(om, -k, axis=0) if k else om
                if k:
                    ids = jnp.where(ids > 0, ids + k * m_slots, 0)
                idw = jax.vmap(_warp_ids, in_axes=(0, 0, 0, 0, None, None, None))(
                    ids, a, tk, qsel, ratio, sf, 2.0 * sf
                )
                if k:
                    idw = jnp.where(sel[:, None, None], idw, 0)
                out_ids = jnp.where(out_ids == 0, idw, out_ids)
            om = out_ids

        # labels: 4 groups of M slots with quadrant (+ center jitter) offsets
        # (plain: only k=0, offset S/2); canvas-clipped to [0, 2S] (reference
        # _cat_labels clips instances to 2S); then the affine x' = a*(x-S) + t
        parts = []
        for k in range(4):
            ck = jnp.roll(cls, -k, axis=0) if k else cls
            bk = jnp.roll(boxes, -k, axis=0) if k else boxes
            mk = jnp.roll(mask, -k, axis=0) if k else mask
            oy, ox = offs[k]
            off_mos = jnp.array([ox, oy, ox, oy]) + jnp.stack(
                [ctr[:, 1], ctr[:, 0], ctr[:, 1], ctr[:, 0]], 1
            )[:, None, :]
            off_pl = jnp.full((b, 1, 4), sf / 2)
            off = jnp.where(sel[:, None, None], off_mos, off_pl)
            if k:
                mk = mk * sel[:, None]
            kk = None
            if kpts is not None:
                kk = jnp.roll(kpts, -k, axis=0) if k else kpts
                kk = jnp.concatenate([kk[..., :2] + off[:, :, None, :2], kk[..., 2:]], axis=-1)
            parts.append((ck, jnp.clip(bk + off * mk[..., None], 0.0, 2.0 * sf), mk, kk))
        cls = jnp.concatenate([p[0] for p in parts], axis=1)
        boxes = jnp.concatenate([p[1] for p in parts], axis=1)
        mask = jnp.concatenate([p[2] for p in parts], axis=1)
        if kpts is not None:
            kpts = jnp.concatenate([p[3] for p in parts], axis=1)
        center = sf
    else:
        t_pl = jnp.stack([a * (-sf / 2) + t[:, 0], a * (-sf / 2) + t[:, 1]], 1)
        img_out = jax.vmap(_warp, in_axes=(0, 0, 0, None))(img, a, t_pl, s)
        cov = jax.vmap(_cover, in_axes=(0, 0, None, None))(a, t_pl, s, s)
        img_out = img_out + GRAY * (1.0 - cov)
        if om is not None:
            om = jax.vmap(_warp_ids, in_axes=(0, 0, 0, 0, None, None, None))(
                om, a, t_pl, jnp.full((b, 2), sf / 2), ratio, sf, 2.0 * sf
            )
        center = sf / 2

    # affine on boxes (x' = a*(x - center) + tx), clip, candidate filter
    w1 = boxes[..., 2] - boxes[..., 0]
    h1 = boxes[..., 3] - boxes[..., 1]
    av = a[:, None, None]
    boxes = jnp.stack(
        [
            av[..., 0] * (boxes[..., 0] - center) + t[:, None, 1],
            av[..., 0] * (boxes[..., 1] - center) + t[:, None, 0],
            av[..., 0] * (boxes[..., 2] - center) + t[:, None, 1],
            av[..., 0] * (boxes[..., 3] - center) + t[:, None, 0],
        ],
        axis=-1,
    )
    boxes = jnp.clip(boxes, 0.0, sf)
    w2 = boxes[..., 2] - boxes[..., 0]
    h2 = boxes[..., 3] - boxes[..., 1]
    # box1 sizes are scale-normalized (w1*a, h1*a) ON PURPOSE: the reference
    # rescales the pre-affine boxes by the draw's scale factor before the
    # candidate test ("Make the bboxes have the same scale with new_bboxes",
    # instances.scale(scale_w=scale, ...) at augment.py:1251-1254), so the
    # area-ratio term measures clipping loss only — identical semantics here.
    # Segment uses the reference's looser 0.01 area threshold (augment.py:1253)
    area_thr = 0.01 if om is not None else 0.1
    mask = mask * _box_candidates(w1 * av[..., 0], h1 * av[..., 0], w2, h2, area_thr=area_thr).astype(mask.dtype)

    if kpts is not None:
        # keypoint affine + out-of-frame visibility zeroing (reference
        # apply_keypoints, augment.py:1124: coords keep their values, only
        # the visible flag drops)
        ak = a[:, None, None]
        kx = ak * (kpts[..., 0] - center) + t[:, None, None, 1]
        ky = ak * (kpts[..., 1] - center) + t[:, None, None, 0]
        inside = (kx >= 0) & (kx < sf) & (ky >= 0) & (ky < sf)
        kpts = jnp.stack([kx, ky, kpts[..., 2] * inside], axis=-1)

    # device mixup (reference MixUp, augment.py:867: beta(32,32) blend of two
    # fully pre-augmented samples, labels concatenated): the companion is the
    # next sample's augmented output (in-batch roll). Runs BEFORE HSV/flip,
    # matching the reference transform order (v8_transforms:2287). Segment is
    # excluded (an overlap-ID map cannot hold instances of two blended images
    # — the trainer falls back to host aug for segment+mixup).
    if hyp.get("mixup", 0.0) > 0:
        assert om is None, "device mixup is not supported for segment (overlap-ID masks)"
        rb = jax.random.beta(r_mx, 32.0, 32.0, (b,))[:, None, None, None]
        do = jax.random.uniform(r_mxs, (b,)) < hyp["mixup"]
        comp = jnp.roll(img_out, -1, axis=0)
        img_out = jnp.where(do[:, None, None, None], img_out * rb + comp * (1.0 - rb), img_out)
        cls = jnp.concatenate([cls, jnp.roll(cls, -1, axis=0)], axis=1)
        boxes = jnp.concatenate([boxes, jnp.roll(boxes, -1, axis=0)], axis=1)
        mask = jnp.concatenate([mask, jnp.roll(mask, -1, axis=0) * do[:, None]], axis=1)
        if kpts is not None:
            kpts = jnp.concatenate([kpts, jnp.roll(kpts, -1, axis=0)], axis=1)

    # HSV jitter (reference RandomHSV:1303; identity when all gains are 0)
    if hyp["hsv_h"] or hyp["hsv_s"] or hyp["hsv_v"]:
        gains = jax.random.uniform(r_hsv, (b, 3), minval=-1.0, maxval=1.0) * jnp.array(
            [hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"]]
        ) + 1.0
        hsv = rgb_to_hsv(img_out)
        h = (hsv[..., 0] * gains[:, None, None, 0]) % 180.0
        sat = jnp.clip(hsv[..., 1] * gains[:, None, None, 1], 0.0, 255.0)
        val = jnp.clip(hsv[..., 2] * gains[:, None, None, 2], 0.0, 255.0)
        img_out = hsv_to_rgb(jnp.stack([h, sat, val], axis=-1))

    # flips (boxes/masks/keypoints follow; flip_idx swaps left/right keypoint
    # identities on horizontal flip only, reference RandomFlip augment.py:1392)
    if hyp["fliplr"]:
        do = jax.random.uniform(r_fl, (b,)) < hyp["fliplr"]
        img_out = jnp.where(do[:, None, None, None], img_out[:, :, ::-1], img_out)
        fx1 = sf - boxes[..., 2]
        fx2 = sf - boxes[..., 0]
        boxes = jnp.where(
            do[:, None, None], jnp.stack([fx1, boxes[..., 1], fx2, boxes[..., 3]], -1), boxes
        )
        if om is not None:
            om = jnp.where(do[:, None, None], om[:, :, ::-1], om)
        if kpts is not None:
            kf = jnp.stack([sf - kpts[..., 0], kpts[..., 1], kpts[..., 2]], axis=-1)
            flip_idx = hyp.get("flip_idx")
            if flip_idx:
                kf = kf[:, :, jnp.asarray(flip_idx, jnp.int32), :]
            kpts = jnp.where(do[:, None, None, None], kf, kpts)
    if hyp["flipud"]:
        do = jax.random.uniform(r_fu, (b,)) < hyp["flipud"]
        img_out = jnp.where(do[:, None, None, None], img_out[:, ::-1], img_out)
        fy1 = sf - boxes[..., 3]
        fy2 = sf - boxes[..., 1]
        boxes = jnp.where(
            do[:, None, None], jnp.stack([boxes[..., 0], fy1, boxes[..., 2], fy2], -1), boxes
        )
        if om is not None:
            om = jnp.where(do[:, None, None], om[:, ::-1], om)
        if kpts is not None:
            kf = jnp.stack([kpts[..., 0], sf - kpts[..., 1], kpts[..., 2]], axis=-1)
            kpts = jnp.where(do[:, None, None, None], kf, kpts)

    out = dict(batch)
    out["img"] = jnp.clip(img_out, 0.0, 255.0) / 255.0
    out["cls"] = cls
    out["bboxes"] = boxes
    out["mask"] = mask
    if kpts is not None:
        out["keypoints"] = kpts
    if om is not None:
        out["masks"] = om
    return out


def aug_hyp_from_args(args, flip_idx=None) -> dict:
    """Extract the trace-time constant dict from the merged config.

    `flip_idx` (pose only): the dataset's left/right keypoint permutation for
    horizontal flips, passed as a tuple so it stays a trace-time constant."""
    return {
        "mosaic": float(args.mosaic),
        "mosaic_center": 0.5,  # reference border fraction (augment.py:658)
        "scale": float(args.scale),
        "translate": float(args.translate),
        "hsv_h": float(args.hsv_h),
        "hsv_s": float(args.hsv_s),
        "hsv_v": float(args.hsv_v),
        "fliplr": float(args.fliplr),
        "flipud": float(args.flipud),
        "mixup": float(getattr(args, "mixup", 0.0) or 0.0),
        "flip_idx": tuple(int(i) for i in flip_idx) if flip_idx is not None else None,
    }
