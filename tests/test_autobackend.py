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


def test_facade_predict_from_exported_artifact(artifacts, tmp_path):
    """YOLO('model.onnx').predict(...) — the reference's exported-artifact
    predict flow: host forward through AutoBackend, jitted NMS, same
    Results as the live model."""
    from experiment_yolo_tpu.engine.model import YOLO
    from experiment_yolo_tpu.engine.predictor import DetectionPredictor

    model, variables, ckpt, shlo, tfl, onnx = artifacts
    img = np.random.RandomState(3).randint(0, 255, (48, 64, 3), np.uint8)

    live = DetectionPredictor(model, variables, overrides={"imgsz": 64, "conf": 0.0001})
    want = live(img)[0]

    for src in (str(onnx), str(shlo)):
        y = YOLO(src, nc=3)
        # no imgsz/batch given: the artifact's baked shape must be adopted
        got = y.predict(img, conf=0.0001)[0]
        assert len(got.boxes) == len(want.boxes)
        np.testing.assert_allclose(np.asarray(got.boxes.xyxy), np.asarray(want.boxes.xyxy),
                                   atol=0.1)
        np.testing.assert_allclose(np.asarray(got.boxes.conf), np.asarray(want.boxes.conf),
                                   atol=1e-3)


def test_facade_rejects_nondetect_artifacts(tmp_path):
    """Seg/pose/obb artifacts need task-specific postprocess: the facade
    raises clearly instead of silently running the detect pipeline."""
    from experiment_yolo_tpu.engine.model import YOLO
    from experiment_yolo_tpu.nn.tasks import SegmentationModel

    model = SegmentationModel(str(Path(__file__).parent / "assets" / "tiny-seg.yaml"))
    variables = model.init(jax.random.PRNGKey(0))
    p = Exporter(model, variables, imgsz=64, batch=1)("onnx", tmp_path / "seg")
    with pytest.raises(NotImplementedError, match="segment"):
        YOLO(str(p))


def test_stablehlo_sidecar_meta_guards_nondetect(tmp_path):
    """Regression: stablehlo serialization carries no task metadata — the
    exporter's sidecar .meta.json must route (or refuse) by task so an OBB
    artifact's (B,A,5) rboxes are never postprocessed as detect xywh."""
    from experiment_yolo_tpu.engine.model import YOLO
    from experiment_yolo_tpu.nn.tasks import OBBModel

    model = OBBModel(str(Path(__file__).parent / "assets" / "tiny-obb.yaml"))
    variables = model.init(jax.random.PRNGKey(0))
    p = Exporter(model, variables, imgsz=64, batch=1)("stablehlo", tmp_path / "obb")
    assert Path(str(p) + ".meta.json").exists()
    be = AutoBackend(str(p))
    assert be.task == "obb" and be.nc == model.nc
    with pytest.raises(NotImplementedError, match="obb"):
        YOLO(str(p))


def test_checkpoint_task_and_robust_unpack(tmp_path):
    """A pose checkpoint through AutoBackend: task is read from the model
    and forward unpacks the 3-output predict without crashing."""
    from experiment_yolo_tpu.nn.tasks import PoseModel

    model = PoseModel(str(Path(__file__).parent / "assets" / "tiny-pose.yaml"))
    variables = model.init(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ck", model, variables)
    be = AutoBackend(str(tmp_path / "ck"))
    assert be.task == "pose"
    boxes, scores = be.forward(np.zeros((1, 64, 64, 3), np.uint8))
    assert boxes.shape[-1] == 4 and scores.shape[-1] == model.nc


def test_saved_model_facade_predict(tmp_path):
    """YOLO(<saved_model dir>) predicts through AutoBackend (reference
    AutoBackend saved_model leg, nn/autobackend.py)."""
    import jax
    import numpy as np

    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.engine.model import YOLO
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("tests/assets/tiny.yaml")
    v = m.init(jax.random.PRNGKey(0))
    p = Exporter(m, v, imgsz=64, batch=1)("saved_model", tmp_path / "sm")
    y = YOLO(str(p))
    img = np.random.RandomState(0).randint(0, 255, (80, 70, 3), np.uint8)
    res = y.predict(img, conf=0.001, save=False)
    assert len(res) == 1 and res[0].boxes is not None
