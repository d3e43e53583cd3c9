"""Two-stage double-inference tests."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.engine.double_inference import (
    DoubleInference,
    DoubleInferenceConfig,
    calculate_optimal_crop,
    per_class_nms,
)
from experiment_yolo_tpu.engine.results import Results
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


def test_calculate_optimal_crop_padding_and_clipping():
    box = np.asarray([100.0, 100.0, 300.0, 200.0])
    x1, y1, x2, y2 = calculate_optimal_crop(box, (400, 400), pad_ratio=0.2, min_pad=32)
    assert x1 == 60 and x2 == 340  # 20% of 200 = 40 px pad
    assert y1 == 68 and y2 == 232  # 20% of 100 = 20 -> min_pad 32
    # clips at borders
    x1, y1, x2, y2 = calculate_optimal_crop(np.asarray([0.0, 0.0, 390.0, 390.0]), (400, 400))
    assert (x1, y1) == (0, 0) and (x2, y2) == (400, 400)


def test_per_class_nms():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10], [50, 50, 60, 60]], float)
    scores = np.asarray([0.9, 0.8, 0.7, 0.6])
    classes = np.asarray([0, 0, 1, 0])
    keep = per_class_nms(boxes, scores, classes, iou_thres=0.45)
    # box1 suppressed by box0 (same class); box2 same coords but class 1 kept
    assert set(keep) == {0, 2, 3}


def test_refine_keeps_or_improves(tmp_path):
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    model.names = {0: "a", 1: "b", 2: "c"}
    img = np.random.RandomState(0).randint(0, 255, (300, 300, 3), np.uint8)
    first = np.asarray(
        [
            [50, 50, 120, 120, 0.6, 0.0],
            [200, 200, 250, 260, 0.1, 1.0],  # below gate: untouched
        ],
        np.float32,
    )
    res = Results(img, "t", model.names, first)
    di = DoubleInference(model, variables, DoubleInferenceConfig(crop_size=128, max_crops=4))
    out = di.refine(res)
    assert isinstance(out, Results)
    # gate: conf must never decrease for surviving original boxes
    for row in out.boxes.data:
        # every surviving box with class 1 (untouched) keeps its conf
        if int(row[5]) == 1:
            assert row[4] == pytest.approx(0.1)
    # empty results pass through
    empty = Results(img, "t", model.names, np.zeros((0, 6), np.float32))
    assert len(di.refine(empty)) == 0
