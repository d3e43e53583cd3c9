"""Vision solutions built on detection+tracking results.

Rebuild of the reference's ``ultralytics/solutions/``: region object
counting, heatmaps, and speed estimation over tracked boxes.
"""

from experiment_yolo_tpu.solutions.solutions import Heatmap, ObjectCounter, SpeedEstimator

__all__ = ["Heatmap", "ObjectCounter", "SpeedEstimator"]
