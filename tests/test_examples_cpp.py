"""C++ ONNX consumer demo (examples/onnx_inference_cpp): compiles with g++,
executes exported graphs, and matches the Python numpy interpreter bit-closely.
Counterpart of the reference's examples/YOLOv8-ONNXRuntime-CPP."""

import shutil
import struct
import subprocess
from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.engine.exporter import Exporter
from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx

CPP = Path(__file__).parent.parent / "examples" / "onnx_inference_cpp" / "onnx_infer.cpp"

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    out = tmp_path_factory.mktemp("cpp") / "onnx_infer"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", str(out), str(CPP)],
        check=True, capture_output=True,
    )
    return out


def _read_dump(path: Path):
    outs = []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<i", f.read(4))
        for _ in range(n):
            (nd,) = struct.unpack("<i", f.read(4))
            dims = struct.unpack(f"<{nd}q", f.read(8 * nd))
            data = np.frombuffer(f.read(4 * int(np.prod(dims))), np.float32)
            outs.append(data.reshape(dims))
    return outs


def _export(yaml_name, cls_name, tmp_path):
    import experiment_yolo_tpu.nn.tasks as tasks

    cls = getattr(tasks, cls_name)
    model = cls(str(Path(__file__).parent / "assets" / yaml_name))
    variables = model.init(jax.random.PRNGKey(0))
    return Exporter(model, variables, imgsz=64, batch=1)("onnx", tmp_path / "m")


@pytest.mark.parametrize("yaml_name,cls_name", [
    ("tiny.yaml", "DetectionModel"),
    ("tiny-seg.yaml", "SegmentationModel"),  # exercises the transposed-conv lowering
])
def test_cpp_matches_numpy_interpreter(binary, yaml_name, cls_name, tmp_path):
    p = _export(yaml_name, cls_name, tmp_path)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    raw = tmp_path / "input.bin"
    img.tofile(raw)
    dump = tmp_path / "out.bin"
    r = subprocess.run(
        [str(binary), str(p), "--raw", str(raw), "--dump", str(dump)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    got = _read_dump(dump)
    want = run_onnx(p.read_bytes(), {"images": img})
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-3, rtol=1e-3)


def test_cpp_ppm_pipeline(binary, tmp_path):
    """Full deployment pipeline: PPM image -> letterbox -> graph -> NMS."""
    p = _export("tiny.yaml", "DetectionModel", tmp_path)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (48, 96, 3), np.uint8)  # non-square -> letterbox
    ppm = tmp_path / "img.ppm"
    with open(ppm, "wb") as f:
        f.write(b"P6\n96 48\n255\n" + img.tobytes())
    r = subprocess.run(
        [str(binary), str(p), str(ppm), "--conf", "0.0001"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "detections" in r.stdout
    assert "output boxes" in r.stdout


def test_cpp_seg_mask_postprocess(binary, tmp_path):
    """Seg graphs get mask assembly in C++ (sigmoid(coeff . protos), box
    crop) — the reference's ops.process_mask consumed by its seg demos."""
    p = _export("tiny-seg.yaml", "SegmentationModel", tmp_path)
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (48, 96, 3), np.uint8)
    ppm = tmp_path / "img.ppm"
    with open(ppm, "wb") as f:
        f.write(b"P6\n96 48\n255\n" + img.tobytes())
    r = subprocess.run(
        [str(binary), str(p), str(ppm), "--conf", "0.0001"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "output protos" in r.stdout
    assert "mask_area" in r.stdout
