"""Multi-object trackers: ByteTrack and BoT-SORT (host-side, callback-wired)."""

from drone_yolo_tpu.trackers.bot_sort import BOTSORT
from drone_yolo_tpu.trackers.byte_tracker import BYTETracker
from drone_yolo_tpu.trackers.track import register_tracker

__all__ = ["BOTSORT", "BYTETracker", "register_tracker"]
