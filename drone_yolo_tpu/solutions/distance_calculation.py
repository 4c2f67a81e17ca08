"""Pairwise distance between two selected tracks (reference solutions/distance_calculation.py)."""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.solutions.solutions import BaseSolution


class DistanceCalculation(BaseSolution):
    def __init__(self, meters_per_pixel: float = 0.05, pair=None, **kwargs):
        super().__init__(**kwargs)
        self.mpp = meters_per_pixel
        self.pair = pair  # (track_id_a, track_id_b) or None = two largest boxes

    def process(self, im0):
        self.extract_tracks(im0)
        dist_m = None
        centers = {tid: ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for tid, b in zip(self.track_ids, self.boxes)}
        ids = list(self.pair) if self.pair else self.track_ids[:2]
        if len(ids) == 2 and all(i in centers for i in ids):
            (x0, y0), (x1, y1) = centers[ids[0]], centers[ids[1]]
            dist_m = float(np.hypot(x1 - x0, y1 - y0)) * self.mpp
        plotted = self.annotate(im0.copy())
        if dist_m is not None:
            self._ann.plot_distance_and_line(dist_m / self.mpp, (centers[ids[0]], centers[ids[1]]))
            plotted = self._ann.result()
        return {"im0": plotted, "distance_m": dist_m, "pair": ids if dist_m is not None else None}
