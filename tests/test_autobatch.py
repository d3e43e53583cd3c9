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


def test_benchmark_formats_table(tmp_path):
    """All-format benchmark (reference utils/benchmarks.py:benchmark):
    every exported format must run and produce a sane-speed row."""
    import jax

    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils.benchmarks import benchmark_formats

    model = DetectionModel("tests/assets/tiny.yaml")
    variables = model.init(jax.random.PRNGKey(0))
    rows = benchmark_formats(model, variables, imgsz=64, iters=2,
                             export_dir=tmp_path)
    assert rows[0]["format"] == "jax (jit)" and rows[0]["status"] == "ok"
    by_fmt = {r["format"]: r for r in rows}
    for fmt in ("stablehlo", "saved_model", "tflite", "onnx"):
        assert by_fmt[fmt]["status"] == "ok", by_fmt[fmt]
        assert by_fmt[fmt]["size_mb"] > 0 and by_fmt[fmt]["ms_per_image"] > 0
