"""Drone-YOLO TPU — a TPU-native (JAX/XLA/Pallas) re-design of the Drone-YOLO framework.

Capability reference: 331658260/Drone-YOLO (an Ultralytics YOLOv8 fork carrying the
Drone-YOLO modifications: P2 detection level, RepVGG downsampling, sandwich-fusion neck).
This is NOT a port — compute runs as jit-compiled XLA programs in NHWC layout with
bfloat16 MXU matmuls/convs, SPMD data parallelism over a `jax.sharding.Mesh`, on-device
NMS, and a functional (pytree) parameter model instead of mutable nn.Modules.
"""

__version__ = "0.3.0"

from drone_yolo_tpu.engine.model import YOLO


def __getattr__(name):
    # lazy facades (reference ultralytics/__init__.py exports): avoid importing
    # every model family at package import
    if name == "NAS":
        from drone_yolo_tpu.models.nas import NAS

        return NAS
    if name == "RTDETR":
        from drone_yolo_tpu.models.rtdetr.model import RTDETR

        return RTDETR
    if name == "SAM":
        from drone_yolo_tpu.models.sam import SAM

        return SAM
    if name == "FastSAM":
        from drone_yolo_tpu.models.fastsam import FastSAM

        return FastSAM
    raise AttributeError(name)


__all__ = ["YOLO", "NAS", "RTDETR", "SAM", "FastSAM", "__version__"]
