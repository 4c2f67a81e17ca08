"""Spatial partitioning: the CNN analog of sequence parallelism (SURVEY §5.7).

The reference scales to megapixel aerial frames by tiled/SAHI inference
(`data/split_dota.py:97-298`, the author's 切块可视化.py) — an approximation
with overlap zones and a merge NMS. On TPU there is an exact alternative:
shard the activation H dim over a "space" mesh axis and let XLA GSPMD insert
the conv halo exchanges. Semantics are bit-equivalent to the unsharded
forward (no tile boundaries, no double detections, no merge heuristics), and
the per-chip HBM footprint drops by ~1/sp — one 5k x 5k frame can run as one
compiled forward across a slice instead of 100 overlapping crops.

Training composes the same way: `model.train(..., sp=N)` builds a
("data", "space"[, "model"]) mesh (engine/trainer.py) and `shard_batch` lays
each image out as P("data", "space"); the backward pass's halo exchanges are
GSPMD-inserted too. Parity: tests/test_sp.py (forward exact; loss trajectory
vs pure DP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from drone_yolo_tpu.parallel.mesh import make_mesh, replicate


def spatial_mesh(sp: int, devices=None):
    """1-D ("space",) mesh over sp devices for single-frame spatial inference."""
    devices = devices if devices is not None else jax.devices()[:sp]
    return make_mesh(shape=(sp,), axes=("space",), devices=devices)


def spatial_forward(model, variables, img, mesh, dtype=jnp.float32):
    """EXACT forward of image batch (B, H, W, C) with H banded over `mesh`.

    `img` H must divide into sp * 32 (even stride-32 bands). Returns the
    decoded head predictions (B, A, 4+nc), sharded over "space" on the anchor
    dim; NMS consumes them directly (it gathers only the top-k candidates).
    """
    from drone_yolo_tpu.nn import modules as M

    sp = mesh.shape["space"]
    assert img.shape[1] % (sp * 32) == 0, f"H={img.shape[1]} must divide into {sp} stride-32 bands"
    xs = jax.device_put(img, NamedSharding(mesh, P(None, "space")))
    vs = jax.device_put(variables, replicate(mesh))

    @jax.jit
    def fwd(v, x):
        preds, _ = model.apply(v, x, ctx=M.Ctx(train=False, dtype=dtype))
        return preds

    prev = M.SP_SAFE_POOL
    M.set_sp_safe_pool(True)  # SelectAndScatter mispartitions under "space"
    try:
        return fwd(vs, xs)
    finally:
        M.set_sp_safe_pool(prev)
