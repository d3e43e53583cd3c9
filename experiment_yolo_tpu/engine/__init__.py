"""Engine layer: model facade, trainer, validator, predictor, exporter."""

from experiment_yolo_tpu.engine.model import YOLO

__all__ = ["YOLO"]
