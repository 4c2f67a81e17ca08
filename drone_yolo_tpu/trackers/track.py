"""Wire trackers into the predictor callback bus (reference trackers/track.py:18-99)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from drone_yolo_tpu.trackers.bot_sort import BOTSORT
from drone_yolo_tpu.trackers.byte_tracker import BYTETracker
from drone_yolo_tpu.utils import IterableSimpleNamespace, yaml_load

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def _load_tracker_cfg(tracker_yaml: str):
    path = Path(tracker_yaml)
    if not path.exists():
        path = Path(__file__).resolve().parents[1] / "cfg" / "trackers" / Path(tracker_yaml).name
    cfg = IterableSimpleNamespace(**yaml_load(path))
    assert cfg.tracker_type in TRACKER_MAP, f"unknown tracker_type {cfg.tracker_type}"
    return cfg


def on_predict_start(predictor, persist: bool = False):
    """Instantiate one tracker per stream (reference track.py:18)."""
    if hasattr(predictor, "trackers") and persist:
        return
    cfg = _load_tracker_cfg(predictor.args.tracker)
    bs = getattr(predictor.dataset, "bs", 1) if predictor.dataset else 1
    predictor.trackers = [TRACKER_MAP[cfg.tracker_type](args=cfg, frame_rate=30) for _ in range(max(bs, 1))]
    predictor._tracker_cfg = cfg


def on_predict_postprocess_end(predictor, persist: bool = False):
    """Associate detections to tracks and rewrite Results boxes with ids (track.py:61)."""
    if not hasattr(predictor, "trackers"):
        on_predict_start(predictor, persist)
    is_stream = predictor.dataset is not None and getattr(predictor.dataset, "mode", "image") == "stream"
    for i, result in enumerate(predictor.results):
        tracker = predictor.trackers[i if is_stream else 0]
        if not persist and getattr(predictor.dataset, "mode", "image") == "image" and not is_stream:
            pass  # keep tracker state across frames of a video file
        if result.boxes is None or len(result.boxes) == 0:
            tracker.update(np.zeros((0, 4)), np.zeros(0), np.zeros(0), result.orig_img)
            continue
        det = result.boxes.data
        tracks = tracker.update(det[:, :4], det[:, 4], det[:, 5], result.orig_img)
        if len(tracks) == 0:
            result.boxes = None
            continue
        # [x1, y1, x2, y2, id, score, cls] — 7 columns flips Boxes.is_track
        result.update(boxes=tracks[:, :7])


def register_tracker(model, persist: bool = False):
    """Attach tracking callbacks to a model facade (reference track.py:91)."""
    from functools import partial

    model.add_tracker_callbacks = True
    cbs = [
        ("on_predict_start", partial(on_predict_start, persist=persist)),
        ("on_predict_postprocess_end", partial(on_predict_postprocess_end, persist=persist)),
    ]
    # callbacks live on the predictor; stash on the facade and forward at predict
    model._pending_tracker_callbacks = cbs
