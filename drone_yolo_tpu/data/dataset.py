"""YOLO-format datasets with hashed label caches and padded static-shape batches.

Capability parity with `ultralytics/data/base.py:21` (BaseDataset) and
`ultralytics/data/dataset.py:45` (YOLODataset: cache_labels, build_transforms,
close_mosaic, collate) plus ClassificationDataset (:389).

TPU re-design: collate pads labels to a static `max_labels` per batch — the
device never sees ragged shapes, so train steps compile once. Image caching uses
an in-RAM dict (optional); everything here is host numpy.
"""

from __future__ import annotations

import glob
import math
import os
import threading
from pathlib import Path

import numpy as np

from drone_yolo_tpu.data.augment import Compose, LetterBoxT, seed_sample, v8_transforms
from drone_yolo_tpu.data.utils import IMG_FORMATS, get_hash, img2label_paths, imread_rgb, verify_image_label
from drone_yolo_tpu.utils import LOGGER, NUM_THREADS, TQDM, colorstr

DATASET_CACHE_VERSION = "1.0"


def round_label_slots(n_max: int, headroom: float) -> int:
    """Static GT-slot count: n_max labels/img x aug headroom, rounded UP to a
    lane/sublane-friendly multiple — NOT the next power of 2. At dense
    drone-regime loads (~130 obj/img x 4 mosaic headroom = 520 needed slots)
    pow2 padding doubled every (B, M, A) assigner tensor (520 -> 1024 vs 640):
    60% extra TAL work and an HBM OOM at b32/640px (ROUND5.md §1b). Multiples
    of 128 keep the M-contraction einsums MXU-aligned; small datasets round to
    32 (sublane granule). Floor 32, cap 2048 (fg-slot cap, loss.py)."""
    need = int(max(n_max * headroom, 1))
    q = 32 if need <= 128 else 128
    return min(max(32, -(-need // q) * q), 2048)


class YOLODataset:
    """Detection/segment/pose dataset over YOLO-txt labels."""

    def __init__(
        self,
        img_path,
        imgsz: int = 640,
        cache: bool = False,
        augment: bool = True,
        hyp=None,
        prefix: str = "",
        batch_size: int = 16,
        stride: int = 32,
        pad: float = 0.5,
        single_cls: bool = False,
        classes=None,
        fraction: float = 1.0,
        data: dict | None = None,
        task: str = "detect",
        max_labels: int | None = None,
        rect: bool = False,
        rect_max_shapes: int = 8,
        stretch: bool = False,
    ):
        self.img_path = img_path
        self.imgsz = imgsz
        self.augment = augment
        self.stretch = stretch  # RT-DETR: square stretch-resize, no letterbox pad
        self.single_cls = single_cls
        self.prefix = prefix
        self.fraction = fraction
        self.data = data or {}
        self.task = task
        self.use_segments = task == "segment"
        self.use_keypoints = task == "pose"
        self.kpt_shape = self.data.get("kpt_shape", (0, 0))
        self.flip_idx = self.data.get("flip_idx", None)
        self.im_files = self.get_img_files(img_path)
        self.label_files = img2label_paths(self.im_files)
        self.labels = self.cache_labels()
        self.update_labels(classes)
        self.ni = len(self.labels)
        self.batch_size = batch_size
        self.stride = stride
        self.pad = pad
        self.hyp = hyp
        self.cache = cache
        self._ram: dict = {}
        # mosaic buffer (reference base.py:145,161-186): recently-decoded images
        # stay resident and mosaic companions are drawn from them, cutting JPEG
        # decodes from ~4/sample to ~1/sample on the train path
        self.buffer: list = []
        self._buffer_ims: dict = {}
        self._buffer_lock = threading.Lock()
        # device_aug: random transforms run on-device (data/device_aug.py); the
        # host path is decode + letterbox only (train interpolation preserved),
        # so the mosaic companion buffer is pointless and stays off
        self.device_aug = augment and hyp is not None and bool(getattr(hyp, "device_aug", False))
        self.max_buffer_length = min(self.ni, batch_size * 8, 1000) if augment and not self.device_aug else 0
        # per-sample deterministic augmentation (augment.seed_sample): the
        # loader sets epoch + a per-thread companion window before each sample
        self.epoch = 0
        self.aug_seed = 0
        self._sample_ctx = threading.local()
        self.rect = rect and not augment
        self.batch_shapes = None
        self.batch = None
        if self.rect:
            self.set_rectangle(rect_max_shapes)
        # static label padding: longest label list, with headroom for mosaic(x4)
        # +mixup only when those augs are actually on — the padded-label dim
        # multiplies every bs x labels x anchors assigner tensor, so a blanket
        # 5x on dense datasets (100+ obj/img) would inflate TAL memory/compile 5x
        n_max = max((len(l["cls"]) for l in self.labels), default=1)
        # device_aug expands GT slots x4 on device, so the host pads without
        # mosaic headroom (the TAL tensors see 4*M either way)
        mosaic_on = augment and not self.device_aug and hyp is not None and (getattr(hyp, "mosaic", 0) or 0) > 0
        mixup_on = augment and not self.device_aug and hyp is not None and (getattr(hyp, "mixup", 0) or 0) > 0
        headroom = (5 if mixup_on else 4) if mosaic_on else (2 if mixup_on else 1.25)
        self.max_labels = max_labels or round_label_slots(n_max, headroom)
        self.transforms = self.build_transforms(hyp)

    # -- files & labels -------------------------------------------------------
    def get_img_files(self, img_path):
        """Glob image files from dir / txt-list / list (reference base.py:118)."""
        f = []
        for p in img_path if isinstance(img_path, list) else [img_path]:
            p = Path(p)
            if p.is_dir():
                f += glob.glob(str(p / "**" / "*.*"), recursive=True)
            elif p.is_file():
                with open(p, encoding="utf-8") as t:
                    parent = str(p.parent) + os.sep
                    f += [x.replace("./", parent) if x.startswith("./") else x for x in t.read().strip().splitlines()]
            else:
                raise FileNotFoundError(f"{self.prefix}{p} does not exist")
        im_files = sorted(x for x in f if x.split(".")[-1].lower() in IMG_FORMATS)
        assert im_files, f"{self.prefix}No images found in {img_path}"
        if self.fraction < 1:
            im_files = im_files[: round(len(im_files) * self.fraction)]
        return im_files

    def cache_labels(self):
        """Verify labels, caching to an .npz next to the labels dir (reference dataset.py:66)."""
        cache_path = Path(self.label_files[0]).parent.with_suffix(".cache.npz") if self.label_files else None
        h = get_hash(self.label_files + self.im_files)
        if cache_path and cache_path.exists():
            try:
                z = np.load(cache_path, allow_pickle=True)
                if str(z["version"]) == DATASET_CACHE_VERSION and str(z["hash"]) == h:
                    return list(z["labels"])
            except Exception:  # noqa: BLE001 - fall through to re-verify
                pass

        nkpt, ndim = (self.kpt_shape or (0, 0))
        labels = []
        nm = nf = ne = nc_bad = 0
        msgs = []
        desc = f"{self.prefix}Scanning {Path(self.img_path if isinstance(self.img_path, str) else self.img_path[0]).parent}..."
        for im_file, lb_file in TQDM(zip(self.im_files, self.label_files), desc=desc, total=len(self.im_files)):
            im, lb, shape, segs, kpts, nm_, nf_, ne_, nc_, msg = verify_image_label(
                im_file, lb_file, self.data.get("nc", 999), self.use_keypoints, nkpt, ndim, self.single_cls
            )
            nm, nf, ne, nc_bad = nm + nm_, nf + nf_, ne + ne_, nc_bad + nc_
            if msg:
                msgs.append(msg)
            if im is None:
                continue
            labels.append(
                {
                    "im_file": im,
                    "shape": shape,
                    "cls": lb[:, 0],
                    "bboxes_n": lb[:, 1:],  # normalized xywh
                    "segments": segs,
                    "keypoints": kpts,
                }
            )
        if msgs:
            LOGGER.info("\n".join(msgs[:10]))
        if nf == 0:
            LOGGER.warning(f"{self.prefix}no labels found; training will not work correctly")
        LOGGER.info(f"{self.prefix}{nf} labels, {nm} missing, {ne} empty, {nc_bad} corrupt")
        if cache_path:
            try:
                np.savez(cache_path, labels=np.array(labels, dtype=object), hash=h, version=DATASET_CACHE_VERSION)
            except OSError as e:
                LOGGER.warning(f"{self.prefix}cache not saved: {e}")
        self.im_files = [l["im_file"] for l in labels]
        return labels

    def update_labels(self, classes):
        """Filter to included classes / single-class (reference base.py:141)."""
        if classes is not None:
            inc = np.asarray(classes).reshape(1, -1)
            for l in self.labels:
                keep = (l["cls"].reshape(-1, 1) == inc).any(1)
                l["cls"] = l["cls"][keep]
                l["bboxes_n"] = l["bboxes_n"][keep]
                if l["keypoints"] is not None:
                    l["keypoints"] = l["keypoints"][keep]
        if self.single_cls:
            for l in self.labels:
                l["cls"][:] = 0

    # -- rect batching -----------------------------------------------------------
    def set_rectangle(self, max_shapes: int = 8):
        """Aspect-sorted rectangular batch planning (reference base.py:261).

        Same math as the reference: sort by aspect ratio, one target shape per
        batch of `batch_size`, quantized to `stride` with a `pad` half-stride
        border. TPU addition: if the number of distinct batch shapes exceeds
        `max_shapes`, the quantization stride is doubled until the compiled-shape
        count is bounded (each merge only grows padding, never crops content).
        """
        bi = np.floor(np.arange(self.ni) / self.batch_size).astype(int)
        nb = int(bi[-1]) + 1
        s = np.array([l["shape"] for l in self.labels], np.float64)  # (h, w)
        ar = s[:, 0] / s[:, 1]
        irect = ar.argsort()
        self.labels = [self.labels[i] for i in irect]
        self.im_files = [l["im_file"] for l in self.labels]
        ar = ar[irect]

        shapes = np.ones((nb, 2), np.float64)
        for i in range(nb):
            ari = ar[bi == i]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                shapes[i] = [maxi, 1]
            elif mini > 1:
                shapes[i] = [1, 1 / mini]

        q = self.stride
        while True:
            batch_shapes = (np.ceil(shapes * self.imgsz / q + self.pad) * q).astype(int)
            n_distinct = len({tuple(x) for x in batch_shapes})
            if n_distinct <= max_shapes or q >= self.imgsz:
                break
            q *= 2
        if q != self.stride:
            LOGGER.info(
                f"{self.prefix}rect: merged batch shapes to {n_distinct} compiled "
                f"shapes (quantization {q}px)"
            )
        self.batch_shapes = batch_shapes
        self.batch = bi

    # -- sample access ---------------------------------------------------------
    def load_image(self, i):
        """Read image i (RGB HWC uint8), resized so long side == imgsz (reference base.py:161).

        Train path keeps decoded images in a bounded FIFO buffer (reference
        base.py:176-180) so mosaic companions (drawn from `self.buffer`) skip
        the JPEG decode; downstream transforms never mutate images in place,
        so sharing the buffered array is safe.
        """
        if i in self._ram:
            return self._ram[i]
        im = self._buffer_ims.get(i)
        if im is not None:
            return im
        import cv2

        path = self.labels[i]["im_file"]
        im = imread_rgb(path)
        if im is None:
            raise FileNotFoundError(f"Image not found {path}")
        h0, w0 = im.shape[:2]
        if self.stretch:  # RT-DETR: square stretch (reference base.py rect_mode=False)
            if (h0, w0) != (self.imgsz, self.imgsz):
                im = cv2.resize(im, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        else:
            r = self.imgsz / max(h0, w0)
            if r != 1:
                im = cv2.resize(im, (min(math.ceil(w0 * r), self.imgsz), min(math.ceil(h0 * r), self.imgsz)), interpolation=cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA)
        if self.cache:
            self._ram[i] = im
        if self.max_buffer_length:
            with self._buffer_lock:
                if not self.cache:
                    self._buffer_ims[i] = im
                self.buffer.append(i)
                if len(self.buffer) > self.max_buffer_length:
                    j = self.buffer.pop(0)
                    self._buffer_ims.pop(j, None)
        return im

    def get_sample(self, i):
        """Raw sample dict with pixel-xyxy boxes (pre-transform)."""
        lb = self.labels[i]
        img = self.load_image(i)
        h, w = img.shape[:2]
        bn = lb["bboxes_n"]
        boxes = np.zeros((0, 4), np.float32)
        if len(bn):
            cx, cy, bw, bh = bn[:, 0] * w, bn[:, 1] * h, bn[:, 2] * w, bn[:, 3] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1).astype(np.float32)
        out = {
            "img": img,
            "cls": lb["cls"].astype(np.float32).copy(),
            "bboxes": boxes,
            "im_file": lb["im_file"],
            "ori_shape": lb["shape"],
        }
        if lb["segments"]:
            out["segments"] = [s * np.array([w, h], np.float32) for s in lb["segments"]]
        if lb["keypoints"] is not None:
            k = lb["keypoints"].copy()
            k[..., 0] *= w
            k[..., 1] *= h
            out["keypoints"] = k.astype(np.float32)
        if self.rect:
            out["rect_shape"] = tuple(int(x) for x in self.batch_shapes[self.batch[i]])
        return out

    def __len__(self):
        return self.ni

    def set_epoch(self, epoch: int, seed: int | None = None):
        """Advance the deterministic augmentation stream (loader calls this)."""
        self.epoch = int(epoch)
        if seed is not None:
            self.aug_seed = int(seed)

    def set_sample_window(self, window):
        """Thread-local companion pool for the next __getitem__ on this thread
        (the trailing slice of the epoch permutation before this sample)."""
        self._sample_ctx.window = window

    def sample_window(self):
        return getattr(self._sample_ctx, "window", None)

    def __getitem__(self, i):
        seed_sample(self.aug_seed, self.epoch, int(i))
        return self.transforms(self.get_sample(i))

    # -- transforms -------------------------------------------------------------
    def build_transforms(self, hyp=None):
        """Train: v8_transforms; val: LetterBox only (reference dataset.py:174).
        device_aug train: LetterBox only too (scaleup like train), randomness
        happens inside the jitted step (data/device_aug.py)."""
        if self.augment and hyp is not None and not getattr(self, "device_aug", False):
            t = v8_transforms(self, self.imgsz, hyp, stretch=self.stretch)
        elif self.stretch:
            from drone_yolo_tpu.data.augment import StretchResizeT

            t = Compose([StretchResizeT((self.imgsz, self.imgsz))])
        else:
            t = Compose([LetterBoxT((self.imgsz, self.imgsz), scaleup=getattr(self, "device_aug", False))])
        return t

    def close_mosaic(self, hyp):
        """Disable mosaic/mixup/copy-paste for final epochs (reference dataset.py:197)."""
        if hyp is not None:
            hyp.mosaic = 0.0
            hyp.mixup = 0.0
            hyp.copy_paste = 0.0
        self.transforms = self.build_transforms(hyp)

    # -- batching ----------------------------------------------------------------
    def collate(self, samples):
        """Stack images + pad labels to (B, max_labels) static shapes."""
        b = len(samples)
        imgs = np.stack([s["img"] for s in samples])
        m = self.max_labels
        cls = np.zeros((b, m), np.float32)
        boxes = np.zeros((b, m, 4), np.float32)
        mask = np.zeros((b, m), np.float32)
        kpts = None
        seg_masks = None
        if self.use_keypoints:
            nk = self.kpt_shape[0]
            kpts = np.zeros((b, m, nk, 3), np.float32)
        if self.use_segments:
            ratio = int(getattr(self.hyp, "mask_ratio", 4) or 4)
            h, w = imgs.shape[1] // ratio, imgs.shape[2] // ratio
            seg_masks = np.zeros((b, h, w), np.int32)
        for i, s in enumerate(samples):
            n = min(len(s["cls"]), m)
            if seg_masks is not None and s.get("segments"):
                # overlap-mode index mask: larger instances first so small ones win
                # (reference data/utils.py:253 polygons2masks_overlap); instance
                # slots are reordered to match the mask indices
                from drone_yolo_tpu.data.utils import polygons2masks_overlap

                om, order = polygons2masks_overlap(imgs.shape[1:3], s["segments"][:n], ratio)
                seg_masks[i] = om
                s = {**s, "cls": s["cls"][order], "bboxes": s["bboxes"][order]}
            if n:
                cls[i, :n] = s["cls"][:n]
                boxes[i, :n] = s["bboxes"][:n]
                mask[i, :n] = 1.0
                if kpts is not None and s.get("keypoints") is not None:
                    kpts[i, :n] = s["keypoints"][:n]
        batch = {
            "img": imgs,
            "cls": cls,
            "bboxes": boxes,
            "mask": mask,
            "im_files": [s.get("im_file", "") for s in samples],
            "ori_shapes": [s.get("ori_shape", s["img"].shape[:2]) for s in samples],
            "ratio_pads": [s.get("ratio_pad") for s in samples],
        }
        if kpts is not None:
            batch["keypoints"] = kpts
        if seg_masks is not None:
            batch["masks"] = seg_masks
        if self.task == "obb":
            batch["segments_list"] = [s.get("segments", []) for s in samples]
        return batch


class ClassificationDataset:
    """torchvision-ImageFolder-style classification dataset (reference dataset.py:389)."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False, fraction: float = 1.0, hyp=None):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            for f in sorted((self.root / c).rglob("*.*")):
                if f.suffix[1:].lower() in IMG_FORMATS:
                    self.samples.append((str(f), self.class_to_idx[c]))
        if fraction < 1.0:
            self.samples = self.samples[: round(len(self.samples) * fraction)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        import cv2

        path, label = self.samples[i]
        im = imread_rgb(path)
        if self.augment:
            from drone_yolo_tpu.data.augment import _rng

            seed_sample(getattr(self, "aug_seed", 0), getattr(self, "epoch", 0), int(i))
            rng = _rng()
            # RandomResizedCrop-style: random scale/ratio crop then resize
            h, w = im.shape[:2]
            area = h * w
            for _ in range(10):
                ta = area * rng.uniform(0.5, 1.0)
                ar = math.exp(rng.uniform(math.log(3 / 4), math.log(4 / 3)))
                cw, ch = int(round(math.sqrt(ta * ar))), int(round(math.sqrt(ta / ar)))
                if cw <= w and ch <= h:
                    x0, y0 = rng.randint(0, w - cw), rng.randint(0, h - ch)
                    im = im[y0 : y0 + ch, x0 : x0 + cw]
                    break
            im = cv2.resize(im, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
            if rng.random() < 0.5:
                im = np.ascontiguousarray(im[:, ::-1])
        else:
            h, w = im.shape[:2]
            r = self.imgsz / min(h, w)
            im = cv2.resize(im, (round(w * r), round(h * r)), interpolation=cv2.INTER_LINEAR)
            top, left = (im.shape[0] - self.imgsz) // 2, (im.shape[1] - self.imgsz) // 2
            im = im[top : top + self.imgsz, left : left + self.imgsz]
        return {"img": im, "cls": label}

    def set_epoch(self, epoch: int, seed: int | None = None):
        self.epoch = int(epoch)
        if seed is not None:
            self.aug_seed = int(seed)

    def collate(self, samples):
        return {
            "img": np.stack([s["img"] for s in samples]),
            "cls": np.asarray([s["cls"] for s in samples], np.int32),
        }
