"""Cumulative presence heatmap (reference solutions/heatmap.py)."""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.solutions.solutions import BaseSolution


class Heatmap(BaseSolution):
    def __init__(self, colormap=None, **kwargs):
        super().__init__(**kwargs)
        self.heat = None
        self.colormap = colormap

    def process(self, im0):
        import cv2

        if self.heat is None:
            self.heat = np.zeros(im0.shape[:2], np.float32)
        self.extract_tracks(im0)
        for box in self.boxes:
            x1, y1, x2, y2 = (int(v) for v in box)
            # gaussian-ish bump over the box footprint
            h, w = max(y2 - y1, 1), max(x2 - x1, 1)
            yy, xx = np.mgrid[0:h, 0:w]
            cy, cx = h / 2, w / 2
            bump = np.exp(-(((yy - cy) / (h / 2 + 1e-6)) ** 2 + ((xx - cx) / (w / 2 + 1e-6)) ** 2))
            y1c, x1c = max(y1, 0), max(x1, 0)
            self.heat[y1c : y1c + h, x1c : x1c + w][: bump.shape[0], : bump.shape[1]] += bump.astype(np.float32)
        norm = (self.heat / (self.heat.max() + 1e-9) * 255).astype(np.uint8)
        cmap = self.colormap if self.colormap is not None else cv2.COLORMAP_PARULA
        colored = cv2.applyColorMap(norm, cmap)
        out = cv2.addWeighted(im0, 0.5, colored, 0.5, 0)
        return {"im0": out, "heatmap": self.heat}
