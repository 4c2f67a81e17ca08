"""AutoBackend uniform reload-and-validate (reference nn/autobackend.py:54):
every export artifact reloads through one interface, produces identical raw
predictions, and re-validates through the real validator (benchmark harness).
"""

import numpy as np
import pytest

import jax

from make_dataset import make_dataset


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.engine.exporter import Exporter

    td = tmp_path_factory.mktemp("artifacts")
    m = YOLO("yolov8n.yaml")
    m.ensure_variables(imgsz=64)
    paths = {}
    for fmt in ("npz", "stablehlo"):
        paths[fmt] = Exporter(overrides={"format": fmt, "imgsz": 64, "batch": 1, "project": str(td), "task": "detect"})(m)
    try:
        import tensorflow  # noqa: F401

        paths["savedmodel"] = Exporter(overrides={"format": "savedmodel", "imgsz": 64, "batch": 1, "project": str(td), "task": "detect"})(m)
        paths["tflite"] = Exporter(overrides={"format": "tflite", "imgsz": 64, "batch": 1, "project": str(td), "task": "detect"})(m)
    except ImportError:
        pass
    return m, paths


def test_autobackend_outputs_agree(exported):
    from drone_yolo_tpu.nn.autobackend import AutoBackend

    m, paths = exported
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    ref = None
    for fmt, p in paths.items():
        b = AutoBackend(p)
        assert b.kind == fmt
        assert b.nc == 80 and 0 in b.names
        out = np.asarray(b(x))
        assert out.shape[0] == 1 and out.shape[-1] == 84  # (B, A, 4+nc)
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)  # tflite quant noise


def test_benchmark_reload_and_validate(tmp_path):
    """benchmark(): export -> AutoBackend reload -> validator mAP per format."""
    yaml_path = make_dataset(tmp_path / "d", n_train=2, n_val=3, size=96, nc=4, seed=0)
    from drone_yolo_tpu import YOLO
    from drone_yolo_tpu.utils.benchmarks import benchmark

    m = YOLO("yolov8n.yaml")
    rows = benchmark(model=m, data=str(yaml_path), imgsz=64, fmts=("npz", "stablehlo"), keep_dir=str(tmp_path))
    assert [r["format"] for r in rows] == ["npz", "stablehlo"]
    for r in rows:
        assert r["status"] == "ok", r
        assert r["latency_ms"] is not None
        assert r["mAP50-95"] is not None  # validated THROUGH the reloaded artifact
