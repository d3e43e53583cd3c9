"""Multi-object trackers: ByteTrack and BoT-SORT (reference: trackers/)."""

from experiment_yolo_tpu.trackers.bot_sort import BOTSORT
from experiment_yolo_tpu.trackers.byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}

__all__ = ["BOTSORT", "BYTETracker", "TRACKER_MAP"]
