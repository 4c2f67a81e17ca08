"""Compact pure-numpy COCO-protocol bbox evaluator.

Implements the COCOeval "bbox" protocol (greedy per-image score-ordered
matching at IoU thresholds 0.5:0.05:0.95, area-range ignore semantics, maxDets
capping, 101-point precision interpolation) so `save_json=True` yields a real
COCO mAP even without pycocotools (not installed in this image). The reference
invokes pycocotools at `ultralytics/models/yolo/detect/val.py:318-322`; when
pycocotools IS importable we defer to it in the validator.

Inputs mirror the COCO json dicts: ground truth as
{"images": [{"id", "height", "width"}], "annotations": [{"image_id",
"category_id", "bbox" [x,y,w,h], "area", "iscrowd", "id"}], "categories": [...]}
and detections as [{"image_id", "category_id", "bbox", "score"}].
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)
# keypoints protocol: maxDets=[20], areas all/medium/large (pycocotools
# Params.setKpParams)
KP_AREA_RNG = {
    "all": (0.0, 1e10),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
KP_MAX_DETS = (20,)


def rle_encode(mask) -> dict:
    """Binary mask (H, W) -> COCO uncompressed RLE (column-major counts,
    alternating runs starting with zeros) — the dict pycocotools emits from
    `mask.encode` before LEB128 compression; `loadRes` accepts it as-is."""
    mask = np.asarray(mask, bool)
    flat = mask.T.reshape(-1)  # column-major
    if flat.size == 0:
        return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": [0]}
    changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    runs = np.diff(np.concatenate([[0], changes, [flat.size]]))
    counts = [int(c) for c in runs]
    if flat[0]:  # counts must start with a zero-run
        counts = [0] + counts
    return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": counts}


def rle_decode(rle: dict):
    """COCO uncompressed RLE -> binary mask (H, W)."""
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos, val = 0, False
    for c in rle["counts"]:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    return flat.reshape(w, h).T


def rle_area(rle: dict) -> float:
    """Mask area of an uncompressed RLE (sum of foreground run lengths)."""
    return float(sum(rle["counts"][1::2]))


def _iou_masks(dts, gts):
    """Mask IoU matrix (D, G) from RLE dicts; crowd GT uses inter/det_area
    (pycocotools mask.iou iscrowd semantics)."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    dm = np.stack([rle_decode(d["segmentation"]).reshape(-1) for d in dts])
    gm = np.stack([rle_decode(g["segmentation"]).reshape(-1) for g in gts])
    inter = (dm[:, None, :] & gm[None, :, :]).sum(-1).astype(float)
    da = dm.sum(-1).astype(float)[:, None]
    ga = gm.sum(-1).astype(float)[None, :]
    union = da + ga - inter
    crowd = np.array([bool(g.get("iscrowd", 0)) for g in gts])[None, :]
    denom = np.where(crowd, da, union)
    return inter / np.maximum(denom, 1e-12)


COCO_KPT_SIGMAS = np.array(
    [0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072, 0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089]
)


def _oks_matrix(dts, gts, sigmas=None):
    """OKS matrix (D, G) — pycocotools cocoeval.computeOks semantics: per-gt
    normalization by area, visible-keypoint mean, exp(-d^2 / (2 area k^2))."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    gk = np.array([g["keypoints"] for g in gts], float).reshape(len(gts), -1, 3)
    dk = np.array([d["keypoints"] for d in dts], float).reshape(len(dts), -1, 3)
    nk = gk.shape[1]
    if sigmas is None:
        sigmas = COCO_KPT_SIGMAS if nk == 17 else np.ones(nk) / nk
    var = (np.asarray(sigmas) * 2.0) ** 2
    out = np.zeros((len(dts), len(gts)))
    for gi, g in enumerate(gts):
        vis = gk[gi, :, 2] > 0
        area = max(float(g.get("area", 1.0)), 1e-9)
        if not vis.any():
            continue
        dx = dk[:, :, 0] - gk[gi, None, :, 0]
        dy = dk[:, :, 1] - gk[gi, None, :, 1]
        e = (dx**2 + dy**2) / var[None, :] / (area + np.spacing(1)) / 2.0
        out[:, gi] = np.exp(-e[:, vis]).mean(axis=1)
    return out


def _iou_xywh(d, g):
    """IoU matrix between det (D,4) and gt (G,4) boxes in xywh."""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    dx1, dy1 = d[:, 0], d[:, 1]
    dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    gx1, gy1 = g[:, 0], g[:, 1]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    ix = np.clip(np.minimum(dx2[:, None], gx2[None]) - np.maximum(dx1[:, None], gx1[None]), 0, None)
    iy = np.clip(np.minimum(dy2[:, None], gy2[None]) - np.maximum(dy1[:, None], gy1[None]), 0, None)
    inter = ix * iy
    union = (d[:, 2] * d[:, 3])[:, None] + (g[:, 2] * g[:, 3])[None] - inter
    return inter / np.maximum(union, 1e-12)


def _evaluate_img(dts, gts, area_rng, max_det, iou_type: str = "bbox"):
    """Match one (image, category) pair. Returns per-threshold det matches,
    det-ignore flags, det scores, and the number of non-ignored gt."""
    T = len(IOU_THRS)

    def _no_vis_kpts(g):
        """GT with zero visible keypoints is ignored in the keypoints protocol
        (pycocotools _prepare: ignore |= num_keypoints == 0)."""
        if "num_keypoints" in g:
            return g["num_keypoints"] == 0
        k = np.asarray(g.get("keypoints", []), float).reshape(-1, 3)
        return not (k[:, 2] > 0).any()

    g_ignore = np.array(
        [
            bool(g.get("iscrowd", 0))
            or not (area_rng[0] <= g["area"] <= area_rng[1])
            or (iou_type == "keypoints" and _no_vis_kpts(g))
            for g in gts
        ],
        dtype=bool,
    )
    # sort gt: non-ignored first (COCOeval gtind ordering)
    g_order = np.argsort(g_ignore, kind="stable")
    gts = [gts[i] for i in g_order]
    g_ignore = g_ignore[g_order]
    scores = np.array([d["score"] for d in dts])
    d_order = np.argsort(-scores, kind="mergesort")[:max_det]
    dts = [dts[i] for i in d_order]
    scores = scores[d_order]

    dbox = np.array([d["bbox"] for d in dts], float).reshape(-1, 4)
    gbox = np.array([g["bbox"] for g in gts], float).reshape(-1, 4)
    if iou_type == "segm":
        ious = _iou_masks(dts, gts)
    elif iou_type == "keypoints":
        ious = _oks_matrix(dts, gts)
    else:
        ious = _iou_xywh(dbox, gbox)

    D, G = len(dts), len(gts)
    dt_m = -np.ones((T, D), int)  # index of matched gt, -1 = unmatched
    gt_m = -np.ones((T, G), int)
    for ti, t in enumerate(IOU_THRS):
        for di in range(D):
            iou_best = min(t, 1 - 1e-10)
            m = -1
            for gi in range(G):
                if gt_m[ti, gi] >= 0 and not gts[gi].get("iscrowd", 0):
                    continue
                # stop at ignored gt if a real match was already found
                if m > -1 and not g_ignore[m] and g_ignore[gi]:
                    break
                if ious[di, gi] < iou_best:
                    continue
                iou_best = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dt_m[ti, di] = m
            gt_m[ti, m] = di
    if iou_type == "segm":
        d_area = np.array([rle_area(d["segmentation"]) for d in dts]) if D else np.zeros(0)
    elif iou_type == "keypoints":
        # pycocotools loadRes: dt area = keypoint-extent bbox area
        if D:
            kk = np.array([d["keypoints"] for d in dts], float).reshape(D, -1, 3)
            d_area = (kk[:, :, 0].max(1) - kk[:, :, 0].min(1)) * (kk[:, :, 1].max(1) - kk[:, :, 1].min(1))
        else:
            d_area = np.zeros(0)
    else:
        d_area = dbox[:, 2] * dbox[:, 3] if D else np.zeros(0)
    d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
    # det ignored if matched to ignored gt, or unmatched and outside area range
    dt_ig = np.zeros((T, D), bool)
    for ti in range(T):
        matched = dt_m[ti] >= 0
        if G:
            ig_of_match = np.where(matched, g_ignore[np.maximum(dt_m[ti], 0)], False)
        else:
            ig_of_match = np.zeros(D, bool)
        dt_ig[ti] = ig_of_match | (~matched & d_out)
    n_gt = int((~g_ignore).sum())
    return dt_m >= 0, dt_ig, scores, n_gt


class COCOevalNP:
    """Numpy COCOeval for bbox/segm. Usage: ev = COCOevalNP(gt, dt[, "segm"]); ev.run(); ev.stats."""

    def __init__(self, gt: dict, dt: list, iou_type: str = "bbox"):
        self.gt = gt
        self.dt = dt
        self.iou_type = iou_type
        self.cat_ids = sorted({c["id"] for c in gt.get("categories", [])} or {a["category_id"] for a in gt["annotations"]})
        self.img_ids = [im["id"] for im in gt["images"]]
        self._gts = defaultdict(list)
        for a in gt["annotations"]:
            if "area" not in a:
                a = {**a, "area": a["bbox"][2] * a["bbox"][3]}
            self._gts[(a["image_id"], a["category_id"])].append(a)
        self._dts = defaultdict(list)
        for d in dt:
            self._dts[(d["image_id"], d["category_id"])].append(d)
        self.stats = None
        self.eval = None
        self.area_rng = KP_AREA_RNG if iou_type == "keypoints" else AREA_RNG
        self.max_dets = KP_MAX_DETS if iou_type == "keypoints" else MAX_DETS

    def run(self):
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(self.area_rng), len(self.max_dets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        area_items = list(self.area_rng.items())
        for ki, cat in enumerate(self.cat_ids):
            for ai, (_, arng) in enumerate(area_items):
                per_img = [
                    _evaluate_img(
                        self._dts.get((img, cat), []), self._gts.get((img, cat), []), arng, max(self.max_dets), self.iou_type
                    )
                    for img in self.img_ids
                    if (img, cat) in self._dts or (img, cat) in self._gts
                ]
                for mi, max_det in enumerate(self.max_dets):
                    matched, ignored, scores, n_gt = [], [], [], 0
                    for dm, dig, sc, ng in per_img:
                        matched.append(dm[:, :max_det])
                        ignored.append(dig[:, :max_det])
                        scores.append(sc[:max_det])
                        n_gt += ng
                    if not per_img:
                        continue
                    scores = np.concatenate(scores)
                    order = np.argsort(-scores, kind="mergesort")
                    dm = np.concatenate(matched, axis=1)[:, order]
                    dig = np.concatenate(ignored, axis=1)[:, order]
                    if n_gt == 0:
                        continue
                    tps = dm & ~dig
                    fps = ~dm & ~dig
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for ti in range(T):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, 1e-12)
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        q = np.zeros(R)
                        # make precision monotonically decreasing then sample
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        valid = inds < len(pr)
                        q[valid] = pr[inds[valid]]
                        precision[ti, :, ki, ai, mi] = q
        self.eval = {"precision": precision, "recall": recall}
        self.stats = self._summarize()
        return self.stats

    def _summ(self, ap=True, iou=None, area="all", max_det=100):
        ai = list(self.area_rng).index(area)
        mi = self.max_dets.index(max_det)
        if ap:
            s = self.eval["precision"][:, :, :, ai, mi]
            if iou is not None:
                s = s[np.isclose(IOU_THRS, iou)]
        else:
            s = self.eval["recall"][:, :, ai, mi]
            if iou is not None:
                s = s[np.isclose(IOU_THRS, iou)]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    def _summarize(self):
        if self.iou_type == "keypoints":
            # pycocotools kps summary: maxDets=20, areas all/medium/large
            return {
                "AP": self._summ(True, max_det=20),
                "AP50": self._summ(True, iou=0.5, max_det=20),
                "AP75": self._summ(True, iou=0.75, max_det=20),
                "APmedium": self._summ(True, area="medium", max_det=20),
                "APlarge": self._summ(True, area="large", max_det=20),
                "AR": self._summ(False, max_det=20),
                "AR50": self._summ(False, iou=0.5, max_det=20),
                "AR75": self._summ(False, iou=0.75, max_det=20),
                "ARmedium": self._summ(False, area="medium", max_det=20),
                "ARlarge": self._summ(False, area="large", max_det=20),
            }
        return {
            "AP": self._summ(True),
            "AP50": self._summ(True, iou=0.5),
            "AP75": self._summ(True, iou=0.75),
            "APsmall": self._summ(True, area="small"),
            "APmedium": self._summ(True, area="medium"),
            "APlarge": self._summ(True, area="large"),
            "AR1": self._summ(False, max_det=1),
            "AR10": self._summ(False, max_det=10),
            "AR100": self._summ(False, max_det=100),
            "ARsmall": self._summ(False, area="small"),
            "ARmedium": self._summ(False, area="medium"),
            "ARlarge": self._summ(False, area="large"),
        }
