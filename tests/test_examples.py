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


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_tflite_example_end_to_end(tmp_path):
    import jax

    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0))
    tfl_path = Exporter(m, v, imgsz=192, batch=1)("tflite", tmp_path / "model")

    out = tmp_path / "pred.jpg"
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "tflite_inference.py"),
         str(tfl_path), str(ASSET), "conf=0.001", f"out={out}"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "detections ->" in r.stdout
    assert out.exists() and out.stat().st_size > 1000


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_region_counter_example(tmp_path):
    import shutil

    frames = tmp_path / "frames"
    frames.mkdir()
    shutil.copy(ASSET, frames / "f0.jpg")
    shutil.copy(ASSET, frames / "f1.jpg")
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "region_counter.py"),
         "yolov8n.yaml", str(frames), "conf=0.001", "imgsz=192"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "2 frames:" in r.stdout


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_sliced_inference_example(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "sliced_inference.py"),
         "yolov8n.yaml", str(ASSET), "slice=192", "imgsz=192", "conf=0.001"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "frame 1:" in r.stdout


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_detect_script(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "detect.py"),
         "model=yolov8n.yaml", f"source={ASSET}", "imgsz=192",
         "conf=0.001", "save=false"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "detections" in r.stdout


@pytest.mark.slow
def test_train_val_scripts_end_to_end(tmp_path):
    from experiment_yolo_tpu.data import make_synthetic_dataset

    data_yaml = make_synthetic_dataset(tmp_path / "ds", n_train=16, n_val=8, imgsz=128)
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "train.py"),
         "model=tests/assets/tiny.yaml", f"data={data_yaml}",
         "epochs=1", "imgsz=128", "batch=8", f"project={tmp_path / 'runs'}"],
        capture_output=True, text=True, timeout=900, cwd=str(REPO), env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    ckpts = list((tmp_path / "runs").rglob("last*"))
    assert ckpts, r.stdout + r.stderr

    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "val.py"),
         f"model={ckpts[0]}", f"data={data_yaml}", "batch=8", "imgsz=128",
         f"project={tmp_path / 'runs'}"],
        capture_output=True, text=True, timeout=900, cwd=str(REPO), env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "mAP" in r.stdout or "map" in r.stdout.lower()


@pytest.mark.slow
@pytest.mark.skipif(not ASSET.exists(), reason="no asset image")
def test_segmentation_onnx_example(tmp_path):
    import jax

    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.tasks import SegmentationModel

    m = SegmentationModel(str(REPO / "tests" / "assets" / "tiny-seg.yaml"))
    v = m.init(jax.random.PRNGKey(0))
    onnx_path = Exporter(m, v, imgsz=192, batch=1)("onnx", tmp_path / "seg")

    out = tmp_path / "pred.jpg"
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "segmentation_onnx_inference.py"),
         str(onnx_path), str(ASSET), "conf=0.001", f"out={out}"],
        capture_output=True, text=True, timeout=900,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "instances ->" in r.stdout
    assert out.exists() and out.stat().st_size > 1000
