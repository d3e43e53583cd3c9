"""Solutions: object counting, heatmap, speed estimation.

Rebuild of the reference's ``solutions/object_counter.py``, ``heatmap.py``
and ``speed_estimation.py`` as small host-side consumers of tracked
Results (x1, y1, x2, y2 boxes + track ids).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _point_in_polygon(pt: Tuple[float, float], poly: Sequence[Tuple[float, float]]) -> bool:
    """Ray-casting point-in-polygon."""
    x, y = pt
    inside = False
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi + 1e-12) + xi:
            inside = not inside
        j = i
    return inside


class ObjectCounter:
    """In/out counting across a region polygon (reference object_counter.py).

    Feed per-frame tracked boxes; an object is counted when its center
    crosses the region boundary.
    """

    def __init__(self, region: Sequence[Tuple[float, float]]):
        assert len(region) >= 3, "region must be a polygon with >= 3 points"
        self.region = list(region)
        self.in_count = 0
        self.out_count = 0
        self.counted_ids: Dict[int, bool] = {}  # id -> last inside state
        self.classwise: Dict[int, Dict[str, int]] = defaultdict(lambda: {"in": 0, "out": 0})

    def update(self, boxes_xyxy: np.ndarray, track_ids: np.ndarray, classes: Optional[np.ndarray] = None):
        classes = classes if classes is not None else np.zeros(len(track_ids))
        for box, tid, cls in zip(boxes_xyxy, track_ids, classes):
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            inside = _point_in_polygon(center, self.region)
            tid = int(tid)
            if tid in self.counted_ids:
                was_inside = self.counted_ids[tid]
                if inside and not was_inside:
                    self.in_count += 1
                    self.classwise[int(cls)]["in"] += 1
                elif was_inside and not inside:
                    self.out_count += 1
                    self.classwise[int(cls)]["out"] += 1
            self.counted_ids[tid] = inside
        return {"in": self.in_count, "out": self.out_count}


class Heatmap:
    """Accumulated detection heatmap (reference heatmap.py)."""

    def __init__(self, shape: Tuple[int, int], decay: float = 0.99):
        self.map = np.zeros(shape, np.float32)
        self.decay = decay

    def update(self, boxes_xyxy: np.ndarray) -> np.ndarray:
        self.map *= self.decay
        h, w = self.map.shape
        for x1, y1, x2, y2 in np.asarray(boxes_xyxy).reshape(-1, 4):
            x1, y1 = max(int(x1), 0), max(int(y1), 0)
            x2, y2 = min(int(x2), w), min(int(y2), h)
            if x2 > x1 and y2 > y1:
                self.map[y1:y2, x1:x2] += 1.0
        return self.map

    def render(self) -> np.ndarray:
        """Normalized uint8 heatmap (overlay-ready)."""
        m = self.map
        return (255 * m / (m.max() + 1e-9)).astype(np.uint8)


class SpeedEstimator:
    """Pixel-displacement speed estimation (reference speed_estimation.py).

    Speeds in px/s (a homography to ground-plane meters is scene-specific;
    pass meters_per_pixel to report m/s).
    """

    def __init__(self, fps: float = 30.0, meters_per_pixel: Optional[float] = None, window: int = 5):
        self.fps = fps
        self.mpp = meters_per_pixel
        self.window = window
        self.history: Dict[int, List[Tuple[float, float]]] = defaultdict(list)
        self.speeds: Dict[int, float] = {}

    def update(self, boxes_xyxy: np.ndarray, track_ids: np.ndarray) -> Dict[int, float]:
        for box, tid in zip(boxes_xyxy, track_ids):
            tid = int(tid)
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            hist = self.history[tid]
            hist.append(center)
            if len(hist) > self.window:
                hist.pop(0)
            if len(hist) >= 2:
                d = np.linalg.norm(np.asarray(hist[-1]) - np.asarray(hist[0]))
                px_per_s = d / (len(hist) - 1) * self.fps
                self.speeds[tid] = px_per_s * self.mpp if self.mpp else px_per_s
        return self.speeds
