"""YOLO-World training: close-set fine-tuning and from-scratch multimodal.

Capability parity with `ultralytics/models/yolo/world/train.py:24`
(WorldTrainer) and `train_world.py:10` (WorldTrainerFromScratch). Text
embeddings come from `utils/text_embed.TextEmbedder` (CLIP when local weights
exist; deterministic hashed embeddings otherwise — zero-egress build).
"""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.data.build import build_dataloader
from drone_yolo_tpu.data.world import GroundingDataset, WorldDataset, YOLOConcatDataset
from drone_yolo_tpu.engine.trainer import BaseTrainer
from drone_yolo_tpu.nn.model import WorldModel
from drone_yolo_tpu.utils.text_embed import TextEmbedder


def _boost_contrastive_bias(variables, value: float = -4.0):
    """From-scratch trainability: the contrastive heads' shared -10 bias is a
    fine-tuning init (reference world models always start from pretrained
    weights); training from random init it traps confidences below the val
    gate for a long time since the bias is one scalar. Raise it to -4 when no
    checkpoint is loaded — documented divergence, inert for fine-tuning."""
    import jax.numpy as jnp

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "bias" in node and "logit_scale" in node and np.shape(node["bias"]) == (1,):
            return {**node, "bias": jnp.asarray([value], jnp.float32)}
        return {k: walk(v) for k, v in node.items()}

    return walk(variables)


class WorldTrainer(BaseTrainer):
    """Fine-tune a world model on a close-set dataset (reference world/train.py:24)."""

    def __init__(self, cfg=None, overrides=None, _callbacks=None, text_embedder=None):
        super().__init__(cfg, overrides, _callbacks)
        self.embedder = text_embedder or TextEmbedder()
        self.max_text_samples = None  # set once the dataset nc is known

    def setup_model(self):
        nc = min(int(self.data.get("nc", 80)), 80)
        self.max_text_samples = nc
        facade = self.model_facade
        if facade is None:
            from drone_yolo_tpu.models.world import YOLOWorld

            facade = self.model_facade = YOLOWorld(self.args.model)
        if not isinstance(facade.model, WorldModel) or facade.model.nc != nc:
            facade.model = WorldModel(facade.model.yaml, nc=nc)
            facade.variables = None
        self.model = facade.model
        names = self.data.get("names", {})
        texts = [str(v).split("/")[0] for _, v in sorted(names.items(), key=lambda kv: int(kv[0]))]
        self.model.set_classes(texts, embeddings=self.embedder(texts))
        fresh = facade.variables is None and facade.ckpt is None
        facade.ensure_variables(imgsz=int(self.args.imgsz), seed=self.args.seed)
        if fresh:
            facade.variables = _boost_contrastive_bias(facade.variables)
        self.variables = facade.variables

    def build_dataset(self, img_path, mode="train", batch=None):
        if mode != "train":
            return super().build_dataset(img_path, mode=mode, batch=batch)
        cfg = self.args
        return WorldDataset(
            img_path=img_path,
            imgsz=cfg.imgsz,
            cache=cfg.cache in (True, "ram"),
            augment=True,
            hyp=cfg,
            prefix="train: ",
            batch_size=batch or self.batch_size,
            stride=int(max(self.model.stride)),
            single_cls=cfg.single_cls,
            data=self.data,
            max_text_samples=self.max_text_samples or 80,
        )

    def preprocess_batch(self, batch):
        """Embed the per-sample sampled texts into (B, max_samples, 512)
        (reference world/train.py:82 preprocess_batch)."""
        texts = batch.get("texts")
        if texts and texts[0] is not None:
            flat = [t for sample in texts for t in sample]
            feats = self.embedder(flat).reshape(len(texts), -1, 512)
            batch = {**batch, "txt_feats": feats.astype(np.float32)}
        return super().preprocess_batch(batch)


class WorldTrainerFromScratch(WorldTrainer):
    """Train a world model from scratch on mixed detection + grounding data
    (reference train_world.py:10).

    `data` config: {"train": {"yolo_data": [yaml, ...], "grounding_data":
    [{"img_path": ..., "json_file": ...}, ...]}, "val": {"yolo_data": [yaml]}}.
    """

    def get_dataset(self):
        from drone_yolo_tpu.data.utils import check_det_dataset

        spec = self.args.data
        assert isinstance(spec, dict) and "train" in spec and "val" in spec, (
            "WorldTrainerFromScratch needs a {'train': ..., 'val': ...} data dict"
        )
        self._train_spec = spec["train"]
        val_yaml = spec["val"]["yolo_data"][0]
        data = check_det_dataset(val_yaml)
        data["train"] = data["val"]  # placeholder; train split built in build_dataset
        return data

    def build_dataset(self, img_path, mode="train", batch=None):
        if mode != "train":
            return super().build_dataset(img_path, mode=mode, batch=batch)
        from drone_yolo_tpu.data.utils import check_det_dataset

        cfg = self.args
        parts = []
        common = dict(
            imgsz=cfg.imgsz,
            augment=True,
            hyp=cfg,
            batch_size=batch or self.batch_size,
            stride=int(max(self.model.stride)),
            max_text_samples=self.max_text_samples or 80,
        )
        for yaml_path in self._train_spec.get("yolo_data", []):
            d = check_det_dataset(yaml_path)
            parts.append(WorldDataset(img_path=d["train"], data=d, prefix="train: ", **common))
        for g in self._train_spec.get("grounding_data", []):
            parts.append(GroundingDataset(img_path=g["img_path"], json_file=g["json_file"], prefix="grounding: ", **common))
        assert parts, "no training datasets configured"
        return parts[0] if len(parts) == 1 else YOLOConcatDataset(parts)
