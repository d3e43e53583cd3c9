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


class AIGym:
    """Workout repetition counter over pose keypoints (reference
    solutions/ai_gym.py:9): the joint angle at three chosen keypoints drives
    an up/down stage machine; a full cycle increments the count. Pose types:
    pushup/pullup/abworkout/squat with the reference's stage transitions."""

    def __init__(self, kpts_to_check: Sequence[int] = (6, 8, 10), pose_type: str = "pushup",
                 pose_up_angle: float = 145.0, pose_down_angle: float = 90.0):
        self.kpts = tuple(int(k) for k in kpts_to_check)
        self.pose_type = pose_type
        self.up_angle = pose_up_angle
        self.down_angle = pose_down_angle
        self.count: List[int] = []
        self.stage: List[str] = []
        self.angle: List[float] = []

    @staticmethod
    def estimate_pose_angle(a, b, c) -> float:
        """Angle at joint b formed by points a-b-c, degrees (the reference's
        Annotator.estimate_pose_angle)."""
        a, b, c = (np.asarray(p, np.float64)[:2] for p in (a, b, c))
        ang = np.degrees(np.arctan2(c[1] - b[1], c[0] - b[0]) - np.arctan2(a[1] - b[1], a[0] - b[0]))
        ang = abs(ang)
        return 360.0 - ang if ang > 180.0 else float(ang)

    def update(self, keypoints: np.ndarray) -> List[int]:
        """keypoints: (n_persons, nk, >=2) pixel coords. Returns counts."""
        n = len(keypoints)
        if len(self.count) != n:
            self.count = [0] * n
            self.angle = [0.0] * n
            self.stage = ["-"] * n
        i0, i1, i2 = self.kpts
        for ind, k in enumerate(keypoints):
            ang = self.estimate_pose_angle(k[i0], k[i1], k[i2])
            self.angle[ind] = ang
            if self.pose_type in ("abworkout", "pullup"):
                if ang > self.up_angle:
                    self.stage[ind] = "down"
                if ang < self.down_angle and self.stage[ind] == "down":
                    self.stage[ind] = "up"
                    self.count[ind] += 1
            else:  # pushup / squat
                if ang > self.up_angle:
                    self.stage[ind] = "up"
                if ang < self.down_angle and self.stage[ind] == "up":
                    self.stage[ind] = "down"
                    self.count[ind] += 1
        return list(self.count)


class DistanceCalculation:
    """Centroid distance between two selected tracks (reference
    solutions/distance_calculation.py:11). The reference converts pixels to
    meters with a fixed pixels-per-meter constant (10); same default here."""

    def __init__(self, pixels_per_meter: float = 10.0):
        self.ppm = pixels_per_meter
        self.selected: Dict[int, np.ndarray] = {}

    @staticmethod
    def centroid(box_xyxy) -> Tuple[float, float]:
        b = np.asarray(box_xyxy, np.float64)
        return (float((b[0] + b[2]) / 2), float((b[1] + b[3]) / 2))

    def select(self, track_id: int, box_xyxy) -> None:
        """Mark a track for measurement (the reference's mouse selection)."""
        if len(self.selected) >= 2 and int(track_id) not in self.selected:
            self.selected.clear()
        self.selected[int(track_id)] = np.asarray(box_xyxy, np.float64)

    def update(self, boxes_xyxy: np.ndarray, track_ids: np.ndarray):
        for box, tid in zip(boxes_xyxy, track_ids):
            if int(tid) in self.selected:
                self.selected[int(tid)] = np.asarray(box, np.float64)

    def distance(self) -> Optional[Tuple[float, float]]:
        """(meters, millimeters) between the two selected tracks
        (reference calculate_distance), or None until two are selected."""
        if len(self.selected) != 2:
            return None
        (b1, b2) = list(self.selected.values())
        c1, c2 = self.centroid(b1), self.centroid(b2)
        pixel_d = float(np.hypot(c1[0] - c2[0], c1[1] - c2[1]))
        m = pixel_d / self.ppm
        return m, m * 1000.0
