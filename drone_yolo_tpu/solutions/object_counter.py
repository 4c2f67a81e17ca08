"""Object counting across a line/region (reference solutions/object_counter.py)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from drone_yolo_tpu.solutions.solutions import BaseSolution


class ObjectCounter(BaseSolution):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.in_count = 0
        self.out_count = 0
        self.counted_ids = set()
        self.classwise_counts = defaultdict(lambda: {"IN": 0, "OUT": 0})
        if self.region is None:
            self.region = [(20, 200), (620, 200)]  # default counting line

    def count_objects(self, current_centroid, track_id, prev_position, cls):
        if prev_position is None or track_id in self.counted_ids:
            return
        if len(self.region) == 2:  # line crossing: sign of cross-product flips
            (x1, y1), (x2, y2) = self.region
            side = lambda p: np.sign((x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1))  # noqa: E731
            s_prev, s_now = side(prev_position), side(current_centroid)
            if s_prev != 0 and s_now != 0 and s_prev != s_now:
                direction = "IN" if s_now > 0 else "OUT"
                self._count(direction, cls)
                self.counted_ids.add(track_id)
        else:  # polygon: entering the region counts
            was_in = self.point_in_region(prev_position)
            is_in = self.point_in_region(current_centroid)
            if not was_in and is_in:
                self._count("IN", cls)
                self.counted_ids.add(track_id)
            elif was_in and not is_in:
                self._count("OUT", cls)
                self.counted_ids.add(track_id)

    def _count(self, direction, cls):
        if direction == "IN":
            self.in_count += 1
        else:
            self.out_count += 1
        self.classwise_counts[self.names.get(cls, str(cls))][direction] += 1

    def process(self, im0):
        self.extract_tracks(im0)
        for box, tid, cls in zip(self.boxes, self.track_ids, self.clss):
            self.store_tracking_history(tid, box)
            current = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            prev = self.track_history[tid][-2] if len(self.track_history[tid]) > 1 else None
            self.count_objects(current, tid, prev, cls)
        plotted = self.annotate(im0.copy())
        # classwise IN/OUT block like the reference's display_counts
        text = {k: f"IN {v['IN']} OUT {v['OUT']}" for k, v in self.classwise_counts.items() if v["IN"] or v["OUT"]}
        if text:
            self._ann.display_analytics(plotted, text)
            plotted = self._ann.result()
        return {"im0": plotted, "in_count": self.in_count, "out_count": self.out_count, "classwise": dict(self.classwise_counts)}
