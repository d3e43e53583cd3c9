"""AutoBackend format parity: yaml / checkpoint / stablehlo / tflite / onnx agree."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.engine.checkpoint import save_checkpoint
from experiment_yolo_tpu.engine.exporter import Exporter
from experiment_yolo_tpu.nn.autobackend import AutoBackend
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("backends")
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    save_checkpoint(root / "ckpt", model, variables)
    ex = Exporter(model, variables, imgsz=64, batch=1)
    shlo = ex("stablehlo", root / "m")
    tfl = ex("tflite", root / "m")
    onnx = ex("onnx", root / "m")
    return model, variables, root / "ckpt", shlo, tfl, onnx


def test_backends_agree(artifacts):
    model, variables, ckpt, shlo, tfl, onnx = artifacts
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    ref_b, ref_s = AutoBackend(ckpt).forward(img)
    for src in (str(shlo), str(tfl), str(onnx)):
        b, s = AutoBackend(src).forward(img)
        np.testing.assert_allclose(b, ref_b, atol=2e-3)
        np.testing.assert_allclose(s, ref_s, atol=1e-4)


def test_format_detection(artifacts):
    _, _, ckpt, shlo, tfl, onnx = artifacts
    assert AutoBackend._model_type(str(ckpt)) == "checkpoint"
    assert AutoBackend._model_type(str(shlo)) == "stablehlo"
    assert AutoBackend._model_type(str(tfl)) == "tflite"
    assert AutoBackend._model_type(str(onnx)) == "onnx"
    assert AutoBackend._model_type("x.yaml") == "yaml"
    with pytest.raises(ValueError):
        AutoBackend("weights.engine")


def test_yaml_backend_warmup():
    be = AutoBackend(TINY)
    be.warmup(imgsz=64)
    assert be.nc == 3
