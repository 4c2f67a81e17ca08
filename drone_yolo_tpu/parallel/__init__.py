"""SPMD parallelism over jax.sharding meshes (replaces the reference's DDP/NCCL)."""

from drone_yolo_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    place_state,
    replicate,
    shard_batch,
)
from drone_yolo_tpu.parallel.spatial import spatial_forward, spatial_mesh

__all__ = [
    "data_sharding",
    "make_mesh",
    "place_state",
    "replicate",
    "shard_batch",
    "spatial_forward",
    "spatial_mesh",
]
