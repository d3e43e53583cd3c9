"""Predictor + Results tests (synthetic images, tiny model)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.engine.predictor import DetectionPredictor, load_source
from experiment_yolo_tpu.engine.results import Results
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_pred")
    make_synthetic_dataset(root, n_train=2, n_val=3, imgsz=200)
    return root / "images" / "val"


@pytest.fixture(scope="module")
def predictor():
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    model.names = {0: "circle", 1: "square", 2: "triangle"}
    return DetectionPredictor(model, variables, overrides={"imgsz": 128, "batch": 2, "conf": 0.0005})


def test_load_source_variants(image_dir):
    # load_source is lazy (streams/videos are unbounded) — list() to realize
    items = list(load_source(image_dir))
    assert len(items) == 3
    one = list(load_source(items[0][0]))
    assert len(one) == 1
    arr = list(load_source(np.zeros((50, 60, 3), np.uint8)))
    assert arr[0][0] == "array"
    with pytest.raises(FileNotFoundError):
        list(load_source("no/such/path.jpg"))


def test_predict_end_to_end(predictor, image_dir):
    results = predictor(image_dir)
    assert len(results) == 3
    for r in results:
        assert isinstance(r, Results)
        assert r.orig_shape == (200, 200)
        # boxes clipped to original image space
        if len(r.boxes):
            assert (r.boxes.xyxy >= 0).all()
            assert (r.boxes.xyxy[:, [0, 2]] <= 200).all()
            assert (r.boxes.xyxyn <= 1.0).all()
        assert r.speed["inference"] >= 0


def test_results_plot_and_txt(predictor, image_dir, tmp_path):
    r = predictor(image_dir)[0]
    img = r.plot()
    assert img.shape == r.orig_img.shape
    txt = tmp_path / "out.txt"
    r.save_txt(txt, save_conf=True)
    lines = [l for l in txt.read_text().splitlines() if l]
    assert len(lines) == len(r.boxes)
    d = r.to_dict()
    assert len(d) == len(r.boxes)
    if d:
        assert set(d[0]) == {"name", "class", "confidence", "box"}
