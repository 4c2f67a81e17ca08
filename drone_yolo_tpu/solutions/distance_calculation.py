"""Pairwise distance between two selected tracks (reference solutions/distance_calculation.py)."""

from __future__ import annotations

import numpy as np

from drone_yolo_tpu.solutions.solutions import BaseSolution


class DistanceCalculation(BaseSolution):
    def __init__(self, meters_per_pixel: float = 0.05, pair=None, **kwargs):
        super().__init__(**kwargs)
        self.mpp = meters_per_pixel
        self.pair = pair  # (track_id_a, track_id_b) or None = two largest boxes
        self.selected_ids: list[int] = []  # interactive picks (mouse/API)

    # -- interactive selection (reference distance_calculation.py:50
    # mouse_event_for_distance): left-click a tracked box to select it (two
    # selections form the measured pair), right-click resets. The callback is
    # cv2-signature-compatible but plain Python, so headless callers/tests can
    # drive it programmatically; attach_window() wires it to a real HighGUI
    # window when a display exists.
    def mouse_event_for_distance(self, event, x, y, flags=0, param=None):
        import cv2

        if event == cv2.EVENT_LBUTTONDOWN:
            for tid, b in zip(self.track_ids, self.boxes):
                if b[0] <= x <= b[2] and b[1] <= y <= b[3] and tid not in self.selected_ids:
                    self.selected_ids.append(int(tid))
                    self.selected_ids = self.selected_ids[-2:]  # keep last two
                    break
        elif event == cv2.EVENT_RBUTTONDOWN:
            self.selected_ids = []

    def attach_window(self, window_name: str = "drone-yolo distance"):
        """Create a HighGUI window wired to the selection callback. Returns
        True when a display is available, False headless (no-op)."""
        import cv2

        try:
            cv2.namedWindow(window_name)
            cv2.setMouseCallback(window_name, self.mouse_event_for_distance)
            return True
        except cv2.error:  # headless build / no display
            return False

    def process(self, im0):
        self.extract_tracks(im0)
        dist_m = None
        centers = {tid: ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for tid, b in zip(self.track_ids, self.boxes)}
        # precedence: interactive picks > configured pair > two first tracks
        if len(self.selected_ids) == 2:
            ids = list(self.selected_ids)
        else:
            ids = list(self.pair) if self.pair else self.track_ids[:2]
        if len(ids) == 2 and all(i in centers for i in ids):
            (x0, y0), (x1, y1) = centers[ids[0]], centers[ids[1]]
            dist_m = float(np.hypot(x1 - x0, y1 - y0)) * self.mpp
        plotted = self.annotate(im0.copy())
        if dist_m is not None:
            self._ann.plot_distance_and_line(dist_m / self.mpp, (centers[ids[0]], centers[ids[1]]))
            plotted = self._ann.result()
        return {"im0": plotted, "distance_m": dist_m, "pair": ids if dist_m is not None else None}
