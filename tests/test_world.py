"""YOLO-World: open-vocabulary head with precomputed text embeddings."""

import numpy as np
import jax
import jax.numpy as jnp


def test_world_set_classes_and_forward():
    from drone_yolo_tpu.nn import modules as M
    from drone_yolo_tpu.nn.model import WorldModel

    m = WorldModel("yolov8n-worldv2.yaml")
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((3, 512)).astype(np.float32)
    m.set_classes(["drone", "person", "car"], embeddings=emb)
    assert m.nc == 3 and m.head.nc == 3

    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    preds, _ = m.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    assert preds.shape[-1] == 4 + 3  # boxes + 3 open-vocab classes

    # different vocabulary size changes the score width without re-init
    emb2 = rng.standard_normal((5, 512)).astype(np.float32)
    m.set_classes([f"c{i}" for i in range(5)], embeddings=emb2)
    preds2, _ = m.apply(v, x, ctx=M.Ctx(train=False, dtype=jnp.float32))
    assert preds2.shape[-1] == 4 + 5
