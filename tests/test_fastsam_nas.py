"""FastSAM everything-mode + prompts, and the NAS facade
(reference models/fastsam/, models/nas/)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.models.fastsam import NAS, FastSAMPredictor
from experiment_yolo_tpu.nn.tasks import SegmentationModel

TINY_SEG = str(Path(__file__).parent / "assets" / "tiny-seg.yaml")


@pytest.fixture(scope="module")
def seg_model():
    model = SegmentationModel(TINY_SEG)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_fastsam_everything_and_prompts(seg_model):
    model, variables = seg_model
    pred = FastSAMPredictor(model, variables, conf=1e-4)
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    res = pred(img)
    assert res["boxes"].shape[1] == 6
    assert res["masks"].ndim == 3 and res["masks"].dtype == bool
    if len(res["masks"]):
        one = FastSAMPredictor.box_prompt(res, [0, 0, 32, 32])
        assert len(one["masks"]) == 1
        pp = FastSAMPredictor.point_prompt(res, [[8, 8]], [1])
        assert len(pp["masks"]) <= len(res["masks"])


def test_nas_facade(tmp_path):
    from experiment_yolo_tpu.data import make_synthetic_dataset
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel(str(Path(__file__).parent / "assets" / "tiny.yaml"))
    variables = model.init(jax.random.PRNGKey(0))
    nas = NAS(model, variables)
    yaml = make_synthetic_dataset(tmp_path, n_train=2, n_val=2, imgsz=64)
    results = nas.predict(str(yaml.parent / "images" / "val"), imgsz=64, batch=2)
    assert len(results) == 2
    assert "params" in nas.info()
