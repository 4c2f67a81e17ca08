"""Drone-video application layer: the capability envelope of the reference
repo's author scripts (mix6.py, 地理坐标转换.py, 数据分析.py, 核密度图画图.py,
切块可视化.py) as an importable package: detect+pose+track video pipeline,
pixel->geographic conversion with a GSD camera model, trajectory/speed
statistics, KDE density maps, and tiled-inference visualization."""

from drone_yolo_tpu.apps.geo import GeoConverter, gsd_meters_per_pixel
from drone_yolo_tpu.apps.pipeline import DroneVideoPipeline
from drone_yolo_tpu.apps.analytics import trajectory_statistics, kde_density

__all__ = ["GeoConverter", "gsd_meters_per_pixel", "DroneVideoPipeline", "trajectory_statistics", "kde_density"]
