"""Open-vocabulary datasets: multimodal text sampling + grounding annotations.

Capability parity with `ultralytics/data/dataset.py:251-372`
(YOLOMultiModalDataset, GroundingDataset, YOLOConcatDataset) and the
`RandomLoadText` transform (`data/augment.py:2150`).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from drone_yolo_tpu.data.augment import _rng
from drone_yolo_tpu.data.dataset import YOLODataset
from drone_yolo_tpu.utils import LOGGER, TQDM


class RandomLoadTextT:
    """Sample positive + negative class texts per image, remap cls indices
    (reference data/augment.py:2150 RandomLoadText)."""

    def __init__(self, max_samples: int = 80, padding: bool = True, neg_samples=(80, 80), prompt_format: str = "{}", padding_value: str = " ", default_texts=None):
        self.max_samples = max_samples
        self.padding = padding
        self.neg_samples = neg_samples
        self.prompt_format = prompt_format
        self.padding_value = padding_value
        self.default_texts = default_texts

    def __call__(self, labels):
        texts = labels.get("texts", self.default_texts)
        if texts is None:
            return labels
        cls = labels["cls"].astype(int).reshape(-1)
        pos = sorted(set(cls.tolist()))
        neg_pool = [i for i in range(len(texts)) if i not in pos]
        n_neg = min(_rng().randint(*self.neg_samples), self.max_samples - len(pos), len(neg_pool))
        sampled = pos + (_rng().sample(neg_pool, n_neg) if n_neg > 0 else [])
        sampled = sampled[: self.max_samples]
        _rng().shuffle(sampled)
        id_map = {c: i for i, c in enumerate(sampled)}
        keep = np.array([c in id_map for c in cls], bool)
        labels["cls"] = np.array([id_map[c] for c in cls[keep]], np.float32)
        labels["bboxes"] = labels["bboxes"][keep]
        out = [self.prompt_format.format(_rng().choice(texts[c])) for c in sampled]
        if self.padding:
            out = out + [self.padding_value] * (self.max_samples - len(out))
        labels["texts"] = out
        return labels


class WorldDataset(YOLODataset):
    """YOLO dataset that attaches per-image class texts for open-vocabulary
    training (reference YOLOMultiModalDataset, dataset.py:251)."""

    def __init__(self, *args, max_text_samples: int = 80, **kwargs):
        self.max_text_samples = max_text_samples
        super().__init__(*args, **kwargs)

    def _class_texts(self):
        names = self.data.get("names", {})
        items = names.items() if isinstance(names, dict) else enumerate(names)
        return [str(v).split("/") for _, v in sorted(items, key=lambda kv: int(kv[0]))]

    def get_sample(self, i):
        out = super().get_sample(i)
        out["texts"] = self._class_texts()
        return out

    def build_transforms(self, hyp=None):
        t = super().build_transforms(hyp)
        if self.augment:
            t.append(
                RandomLoadTextT(
                    max_samples=self.max_text_samples, padding=True, default_texts=self._class_texts()
                )
            )
        return t

    def collate(self, samples):
        batch = super().collate(samples)
        batch["texts"] = [s.get("texts") for s in samples]
        return batch


class GroundingDataset(WorldDataset):
    """Grounding dataset: boxes + caption token spans from a COCO-style json
    (reference data/dataset.py:283)."""

    def __init__(self, img_path, json_file, **kwargs):
        self.json_file = json_file
        super().__init__(img_path=img_path, **kwargs)

    def get_img_files(self, img_path):
        self._img_root = Path(img_path)
        return []  # filled by cache_labels from the json

    def _class_texts(self):
        return None  # grounding samples carry their own per-image texts

    def cache_labels(self):
        labels = []
        with open(self.json_file, encoding="utf-8") as f:
            anno = json.load(f)
        images = {int(x["id"]): x for x in anno["images"]}
        per_img = defaultdict(list)
        for a in anno["annotations"]:
            per_img[int(a["image_id"])].append(a)
        for img_id, anns in TQDM(per_img.items(), desc=f"grounding {self.json_file}"):
            img = images[img_id]
            h, w, fname = img["height"], img["width"], img["file_name"]
            im_file = self._img_root / fname
            if not im_file.exists():
                continue
            caption = img.get("caption", "")
            cat2id, texts, boxes = {}, [], []
            for a in anns:
                if a.get("iscrowd"):
                    continue
                x, y, bw, bh = a["bbox"]
                if bw <= 0 or bh <= 0:
                    continue
                phrase = " ".join(caption[t[0] : t[1]] for t in a.get("tokens_positive", [])) or "object"
                if phrase not in cat2id:
                    cat2id[phrase] = len(cat2id)
                    texts.append([phrase])
                boxes.append([cat2id[phrase], (x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h])
            lb = np.array(boxes, np.float32) if boxes else np.zeros((0, 5), np.float32)
            labels.append(
                {
                    "im_file": str(im_file),
                    "shape": (h, w),
                    "cls": lb[:, 0],
                    "bboxes_n": lb[:, 1:],
                    "segments": [],
                    "keypoints": None,
                    "texts": texts,
                }
            )
        if not labels:
            LOGGER.warning(f"grounding: no usable annotations in {self.json_file}")
        self.im_files = [l["im_file"] for l in labels]
        return labels

    def get_sample(self, i):
        out = YOLODataset.get_sample(self, i)
        out["texts"] = self.labels[i]["texts"]
        return out


class SemanticDataset:
    """Semantic segmentation dataset — the reference's own class is an empty
    placeholder with no methods (`data/dataset.py:372`: "currently a placeholder
    and needs to be populated"); mirrored here for API-surface parity."""

    def __init__(self):
        raise NotImplementedError(
            "SemanticDataset is a placeholder in the reference (data/dataset.py:372); "
            "use task='segment' (instance masks) instead"
        )


class YOLOConcatDataset:
    """Concatenation of datasets sharing one collate (reference dataset.py:358)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets])
        self.max_labels = max(d.max_labels for d in self.datasets)
        for d in self.datasets:
            d.max_labels = self.max_labels
        first = self.datasets[0]
        self.use_segments, self.use_keypoints = first.use_segments, first.use_keypoints
        self.task, self.hyp, self.kpt_shape = first.task, first.hyp, first.kpt_shape

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, i):
        d = int(np.searchsorted(self.cum, i, side="right"))
        return self.datasets[d][i - (int(self.cum[d - 1]) if d else 0)]

    def collate(self, samples):
        return self.datasets[0].collate(samples)

    def close_mosaic(self, hyp):
        for d in self.datasets:
            d.close_mosaic(hyp)
