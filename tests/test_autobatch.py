"""AutoBatch: XLA memory-analysis based batch search (reference
utils/autobatch.py:13, batch=-1 contract)."""

import jax.numpy as jnp
import pytest

from experiment_yolo_tpu.nn.tasks import DetectionModel
from experiment_yolo_tpu.utils.autobatch import _step_peak_bytes, autobatch
from experiment_yolo_tpu.utils.loss import LossConfig


def test_peak_bytes_scale_with_batch():
    model = DetectionModel("tests/assets/tiny.yaml")
    cfg = LossConfig(nc=model.nc)
    p2 = _step_peak_bytes(model, cfg, 2, 64, 16, jnp.float32)
    p4 = _step_peak_bytes(model, cfg, 4, 64, 16, jnp.float32)
    assert p4 > p2 > 0


def test_autobatch_fallback_and_estimate():
    model = DetectionModel("tests/assets/tiny.yaml")
    b = autobatch(model, imgsz=64, default_batch=12, max_labels=16)
    # CPU backend reports a bytes_limit too (host RAM) -> either a real
    # estimate or the fallback; both must be sane
    assert 1 <= b <= 1024
