"""Device-mesh construction and sharding helpers.

This replaces the ENTIRE distributed stack of the reference (§2.8 of SURVEY.md:
the torch.distributed.run re-exec launcher `utils/dist.py:25-66`, NCCL process
groups `trainer.py:218-229`, DistributedSampler, loss x world_size scaling, and
the stop-flag broadcasts): in JAX's single-controller SPMD model, the train step
is jitted over a `Mesh` with the batch sharded on the "data" axis and parameters
replicated; XLA inserts the gradient all-reduce over ICI (and DCN across slices).
No subprocess launcher, no temp-file re-exec, no explicit collectives in user
code. Multi-host runs call `jax.distributed.initialize()` once per process and
run the same program.

The mesh is 1-D ("data") today; model axes ("model" for tensor parallelism) can
be added to the same Mesh without touching the trainer — shardings are expressed
as PartitionSpecs over named axes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from drone_yolo_tpu.utils import LOGGER


def make_mesh(shape=None, axes=("data",), devices=None) -> Mesh:
    """Build a Mesh; default 1-D over all devices."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    assert shape is not None and int(np.prod(shape)) == len(devices), (
        f"mesh shape {shape} does not cover {len(devices)} devices"
    )
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays: first dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def place_state(state, mesh: Mesh, zero: bool = False):
    """Place a train-state pytree on the mesh.

    1-D ("data") mesh: fully replicated (pure DP). With a "model" axis, wide
    conv kernels (HWIO) and matching channel vectors are sharded over it —
    tensor parallelism by annotation only; XLA GSPMD inserts the collectives.

    zero=True (ZeRO-style sharded train state — beyond-reference; the torch
    analog is ZeRO-1/2, which torch DDP in the reference does not offer):
    every top-level subtree EXCEPT "params" (optimizer moments, EMA weights,
    gradient-accumulation buffers) shards its leaves over the "data" axis —
    each leaf on its trailing divisible dim (channel-major, so shards stay
    layout-contiguous). Params stay replicated, so forward/backward need no
    gathers; XLA GSPMD reduce-scatters gradients into the sharded accumulator
    and the elementwise optimizer update runs on 1/N of the state per device.
    Per-device train-state memory drops from ~5x params to ~(1 + 4/N)x.
    """
    tp = mesh.shape["model"] if "model" in mesh.axis_names else 1
    dsize = mesh.shape["data"] if "data" in mesh.axis_names else 1
    rep = replicate(mesh)

    def place(x):
        if tp > 1:
            if getattr(x, "ndim", 0) == 4 and x.shape[-1] % tp == 0 and x.shape[-1] >= 64:
                return jax.device_put(x, NamedSharding(mesh, P(None, None, None, "model")))
            if getattr(x, "ndim", 0) == 1 and x.shape[0] % tp == 0 and x.shape[0] >= 64:
                return jax.device_put(x, NamedSharding(mesh, P("model")))
        return jax.device_put(x, rep)

    if not (zero and dsize > 1 and isinstance(state, dict)):
        return jax.tree_util.tree_map(place, state)

    def place_zero(x):
        nd = getattr(x, "ndim", 0)
        if nd:
            if tp > 1 and x.shape[-1] % (tp * dsize) == 0 and x.shape[-1] >= 64:
                spec = [None] * (nd - 1) + [("model", "data")]
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
            for d in range(nd - 1, -1, -1):  # trailing (channel) dim first
                if x.shape[d] and x.shape[d] % dsize == 0:
                    spec = [None] * nd
                    spec[d] = "data"
                    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return place(x)

    return {
        k: jax.tree_util.tree_map(place if k == "params" else place_zero, v)
        for k, v in state.items()
    }


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put a host batch dict with the leading dim sharded over `axis`.

    Replaces DistributedSampler + per-rank batch division (reference
    data/build.py:144, trainer.py:286). Single-process: the GLOBAL batch is
    laid out across local devices in one call. Multi-process (after
    jax.distributed.initialize): each process holds only its LOCAL stripe
    (1/process_count of the global batch, from the loader's per-host
    permutation slice) and `jax.make_array_from_process_local_data` assembles
    the global jax.Array without any host gathering — the reference's
    DistributedSampler semantics with zero cross-host data movement.
    Tested in tests/test_multihost.py with 2 real processes over localhost.
    """
    sh = data_sharding(mesh, axis)
    rep = replicate(mesh)
    nproc = jax.process_count()
    # spatial partitioning (the CNN analog of sequence parallelism, SURVEY
    # §5.7): with a "space" mesh axis, image tensors additionally shard their
    # H dim — GSPMD inserts the conv halo exchanges; semantics are EXACT
    # (unlike tiled/SAHI inference there is no boundary approximation)
    sp = mesh.shape["space"] if "space" in mesh.axis_names else 1
    img_sh = NamedSharding(mesh, P(axis, "space")) if sp > 1 else sh
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v  # host-side metadata (paths, shapes)
        elif (
            k == "img" and v.ndim == 4 and sp > 1
            and (v.shape[0] * nproc) % mesh.shape[axis] == 0 and v.shape[1] % sp == 0
        ):
            if nproc > 1:
                global_shape = (v.shape[0] * nproc, *v.shape[1:])
                out[k] = jax.make_array_from_process_local_data(img_sh, v, global_shape)
            else:
                out[k] = jax.device_put(v, img_sh)
        elif v.ndim >= 1 and (v.shape[0] * nproc) % mesh.shape[axis] == 0:
            if nproc > 1:
                global_shape = (v.shape[0] * nproc, *v.shape[1:])
                out[k] = jax.make_array_from_process_local_data(sh, v, global_shape)
            else:
                out[k] = jax.device_put(v, sh)
        else:
            if nproc > 1:
                out[k] = jax.make_array_from_process_local_data(rep, v, v.shape)
            else:
                out[k] = jax.device_put(v, rep)
    return out
