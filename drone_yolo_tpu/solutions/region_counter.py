"""Live per-region object counts (reference solutions/region_counter.py)."""

from __future__ import annotations

from drone_yolo_tpu.solutions.solutions import BaseSolution


class RegionCounter(BaseSolution):
    def __init__(self, regions=None, **kwargs):
        super().__init__(**kwargs)
        # regions: {"name": [(x,y), ...]}
        self.regions = regions or ({"region-1": self.region} if self.region else {})
        self.region_counts = {k: 0 for k in self.regions}

    def process(self, im0):
        self.extract_tracks(im0)
        self.region_counts = {k: 0 for k in self.regions}
        for box in self.boxes:
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            for name, poly in self.regions.items():
                if self.point_in_region(c, poly):
                    self.region_counts[name] += 1
        return {"im0": self.annotate(im0.copy()), "region_counts": dict(self.region_counts)}
