"""Export tests: StableHLO round-trip (+ SavedModel/TFLite smoke if TF works)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.engine.exporter import Exporter, load_stablehlo
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def setup():
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_stablehlo_roundtrip(setup, tmp_path):
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("stablehlo", tmp_path / "tiny")
    assert p.exists() and p.stat().st_size > 1000

    fn = load_stablehlo(p)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    boxes, scores = fn(jnp.asarray(img))
    # must equal the live model's output
    ref_boxes, ref_scores = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes), atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-5)


def test_tflite_export_runs(setup, tmp_path):
    tf = pytest.importorskip("tensorflow")
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("tflite", tmp_path / "tiny")
    assert p.exists() and p.stat().st_size > 1000
    # run the flatbuffer through the TFLite interpreter
    interp = tf.lite.Interpreter(model_path=str(p))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    interp.set_tensor(inp["index"], img)
    interp.invoke()
    outs = [interp.get_tensor(o["index"]) for o in interp.get_output_details()]
    shapes = sorted(tuple(o.shape) for o in outs)
    assert shapes == sorted([(1, 80, 4), (1, 80, 3)])  # 8x8 + 4x4 anchors, nc=3


def test_unknown_format_raises(setup, tmp_path):
    model, variables = setup
    with pytest.raises(ValueError):
        Exporter(model, variables)("coreml", tmp_path / "x")
