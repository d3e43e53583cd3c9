"""Optimizers: Ultralytics-semantics builders + SOAP."""

from experiment_yolo_tpu.optim.builders import build_optimizer
from experiment_yolo_tpu.optim.soap import soap

__all__ = ["build_optimizer", "soap"]
