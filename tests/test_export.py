"""Export formats: stablehlo (always), savedmodel/tflite (gated on tensorflow)."""

import numpy as np
import pytest


def test_savedmodel_roundtrip(tmp_path):
    tf = pytest.importorskip("tensorflow")

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    path = m.export(format="savedmodel", imgsz=64, batch=1, project=str(tmp_path))
    loaded = tf.saved_model.load(path)
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    out = loaded.f(tf.constant(x))
    out0 = out[0] if isinstance(out, (list, tuple)) else out
    assert tuple(np.asarray(out0).shape) == (1, 84, 84)

    # parity with the live jit path
    import jax.numpy as jnp

    from drone_yolo_tpu.nn import modules as M

    v = m.model.fuse(m.variables)
    live, _ = m.model.apply(v, jnp.asarray(x), ctx=M.Ctx(train=False, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(live), rtol=2e-2, atol=1e-3)


def test_tflite_roundtrip(tmp_path):
    tf = pytest.importorskip("tensorflow")

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    path = m.export(format="tflite", imgsz=64, batch=1, project=str(tmp_path))
    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
    interp.invoke()
    out = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert out.shape == (1, 84, 84)


def test_tflite_int8_ptq(tmp_path):
    """int8=True quantizes the TFLite artifact via PTQ calibration (reference
    exporter int8 path); the quantized interpreter still produces sane preds."""
    tf = pytest.importorskip("tensorflow")

    from drone_yolo_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    path = m.export(format="tflite", imgsz=64, batch=1, int8=True, project=str(tmp_path))
    assert str(path).endswith("_int8.tflite")
    # quantized artifact is substantially smaller than float32 weights
    fp_path = m.export(format="tflite", imgsz=64, batch=1, project=str(tmp_path))
    import os

    assert os.path.getsize(path) < 0.45 * os.path.getsize(fp_path)
    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], np.random.default_rng(0).random((1, 64, 64, 3), np.float32))
    interp.invoke()
    out = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert out.shape == (1, 84, 84) and np.isfinite(out).all()
