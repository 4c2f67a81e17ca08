"""Solutions: ready-made video-analytics apps on top of detect+track.

Capability parity with `ultralytics/solutions/` (BaseSolution + object counting,
heatmaps, speed estimation, region counting, queue management, ...).
"""

from drone_yolo_tpu.solutions.solutions import BaseSolution
from drone_yolo_tpu.solutions.object_counter import ObjectCounter
from drone_yolo_tpu.solutions.heatmap import Heatmap
from drone_yolo_tpu.solutions.speed_estimation import SpeedEstimator
from drone_yolo_tpu.solutions.region_counter import RegionCounter
from drone_yolo_tpu.solutions.queue_management import QueueManager
from drone_yolo_tpu.solutions.distance_calculation import DistanceCalculation
from drone_yolo_tpu.solutions.inference_app import Inference
from drone_yolo_tpu.solutions.extra import (
    AIGym,
    Analytics,
    InstanceSegmentation,
    ParkingManagement,
    SecurityAlarm,
    TrackZone,
)

__all__ = [
    "BaseSolution", "ObjectCounter", "Heatmap", "SpeedEstimator",
    "RegionCounter", "QueueManager", "DistanceCalculation", "Inference",
    "AIGym", "Analytics", "InstanceSegmentation", "ParkingManagement",
    "SecurityAlarm", "TrackZone",
]
