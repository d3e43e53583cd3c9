"""Association cost matrices + assignment for trackers.

Rebuild of the reference's ``trackers/utils/matching.py`` (138 LoC) with
``scipy.optimize.linear_sum_assignment`` in place of the ``lap`` package.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import scipy.optimize

from experiment_yolo_tpu.utils.metrics import box_iou_np


def iou_distance(atracks: List, btracks: List) -> np.ndarray:
    """1 - IoU between two track lists (uses .xyxy)."""
    a = np.asarray([t.xyxy for t in atracks], np.float32).reshape(-1, 4)
    b = np.asarray([t.xyxy for t in btracks], np.float32).reshape(-1, 4)
    if len(a) == 0 or len(b) == 0:
        return np.ones((len(a), len(b)), np.float32)
    return 1.0 - box_iou_np(a, b)


def fuse_score(cost_matrix: np.ndarray, detections: List) -> np.ndarray:
    """Fuse detection confidence into the IoU cost (reference matching.py)."""
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1.0 - cost_matrix
    det_scores = np.asarray([d.score for d in detections])[None].repeat(cost_matrix.shape[0], 0)
    fused = iou_sim * det_scores
    return 1.0 - fused


def linear_assignment(cost_matrix: np.ndarray, thresh: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hungarian assignment with cost gate.

    Returns (matches (M,2), unmatched_a, unmatched_b).
    """
    if cost_matrix.size == 0:
        return (
            np.empty((0, 2), int),
            np.arange(cost_matrix.shape[0]),
            np.arange(cost_matrix.shape[1]),
        )
    rows, cols = scipy.optimize.linear_sum_assignment(cost_matrix)
    matches = [[r, c] for r, c in zip(rows, cols) if cost_matrix[r, c] <= thresh]
    matches = np.asarray(matches, int).reshape(-1, 2)
    unmatched_a = np.setdiff1d(np.arange(cost_matrix.shape[0]), matches[:, 0] if len(matches) else [])
    unmatched_b = np.setdiff1d(np.arange(cost_matrix.shape[1]), matches[:, 1] if len(matches) else [])
    return matches, unmatched_a, unmatched_b
