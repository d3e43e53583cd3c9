"""Deployment-consumer examples run end-to-end (VERDICT r2 item 10):
export an artifact, then execute the standalone example script on a real
image the way a downstream user would."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
ASSET = Path("/root/reference/assets/bus.jpg")


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_onnx_example_end_to_end(tmp_path):
    import jax

    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0))
    onnx_path = Exporter(m, v, imgsz=192, batch=1)("onnx", tmp_path / "model")

    out = tmp_path / "pred.jpg"
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "onnx_inference.py"),
         str(onnx_path), str(ASSET), "conf=0.001", f"out={out}"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "detections ->" in r.stdout
    assert out.exists() and out.stat().st_size > 1000


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_stablehlo_example_end_to_end(tmp_path):
    import jax

    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0))
    hlo_path = Exporter(m, v, imgsz=192, batch=1)("stablehlo", tmp_path / "model")

    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "stablehlo_inference.py"),
         str(hlo_path), str(ASSET), "conf=0.0001"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "raw detections" in r.stdout
