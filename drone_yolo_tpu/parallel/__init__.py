"""SPMD parallelism over jax.sharding meshes (replaces the reference's DDP/NCCL)."""

from drone_yolo_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["data_sharding", "make_mesh", "replicate", "shard_batch"]
