"""Drone-YOLO TPU — a TPU-native (JAX/XLA/Pallas) re-design of the Drone-YOLO framework.

Capability reference: 331658260/Drone-YOLO (an Ultralytics YOLOv8 fork carrying the
Drone-YOLO modifications: P2 detection level, RepVGG downsampling, sandwich-fusion neck).
This is NOT a port — compute runs as jit-compiled XLA programs in NHWC layout with
bfloat16 MXU matmuls/convs, SPMD data parallelism over a `jax.sharding.Mesh`, on-device
NMS, and a functional (pytree) parameter model instead of mutable nn.Modules.
"""

__version__ = "0.1.0"

from drone_yolo_tpu.engine.model import YOLO

__all__ = ["YOLO", "__version__"]
