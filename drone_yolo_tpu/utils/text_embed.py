"""Text embedding provider for open-vocabulary (YOLO-World) training.

The reference encodes class texts with CLIP at train time
(`models/yolo/world/train.py:82-92`). This build is zero-egress, so the
provider resolves in order:

1. user-supplied embedding table (exact control, e.g. precomputed CLIP),
2. a locally-cached CLIP via transformers when its weights exist on disk,
3. a deterministic hashed-Gaussian fallback: each unique text maps to a fixed
   L2-normalized pseudo-embedding (stable across processes), so the image side
   can still learn to align with a consistent text space. Real CLIP semantics
   (zero-shot transfer) obviously require (1) or (2).
"""

from __future__ import annotations

import hashlib

import numpy as np

from drone_yolo_tpu.utils import LOGGER


class TextEmbedder:
    """Callable: list[str] -> (n, dim) float32, rows L2-normalized."""

    def __init__(self, dim: int = 512, table: dict | None = None, use_clip: str = "auto"):
        self.dim = dim
        self.table = dict(table or {})
        self.cache: dict[str, np.ndarray] = {}
        self._clip = None
        if use_clip == "auto":
            import os

            # zero-egress: only local weights count — never hit the hub
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
            try:
                from drone_yolo_tpu.nn.model import clip_text_embeddings

                clip_text_embeddings(["probe"])
                self._clip = clip_text_embeddings
                LOGGER.info("TextEmbedder: using local CLIP weights")
            except Exception:  # noqa: BLE001 - zero-egress fallback
                self._clip = None

    def _hash_embed(self, text: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "little")
        v = np.random.default_rng(seed).standard_normal(self.dim).astype(np.float32)
        return v / (np.linalg.norm(v) + 1e-12)

    def __call__(self, texts) -> np.ndarray:
        missing = [t for t in texts if t not in self.cache and t not in self.table]
        if missing:
            if self._clip is not None:
                e = np.asarray(self._clip(missing), np.float32)
                e = e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
                for t, row in zip(missing, e):
                    self.cache[t] = row
            else:
                for t in missing:
                    self.cache[t] = self._hash_embed(t)
        return np.stack([self.table.get(t, self.cache.get(t)) for t in texts])
