"""Task-aware predict: segment/pose/obb models produce Results with masks /
keypoints / oriented boxes through the streaming predictor (reference
models/yolo/{segment,pose,obb}/predict.py)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.engine.predictor import DetectionPredictor

ASSETS = Path(__file__).parent / "assets"


def _predict(cls_name, yaml_name):
    import experiment_yolo_tpu.nn.tasks as tasks

    model = getattr(tasks, cls_name)(str(ASSETS / yaml_name))
    variables = model.init(jax.random.PRNGKey(0))
    img = np.random.RandomState(5).randint(0, 255, (48, 96, 3), np.uint8)
    pred = DetectionPredictor(model, variables, overrides={"imgsz": 64, "conf": 1e-4})
    return pred(img)[0], img


def test_segment_predict_results():
    res, img = _predict("SegmentationModel", "tiny-seg.yaml")
    assert res.masks is not None and len(res.masks) == len(res.boxes)
    assert res.masks.data.shape[1:] == img.shape[:2]
    # every mask lives inside (the int-rounded) box
    for m, box in zip(res.masks.data, res.boxes.xyxy):
        ys, xs = np.nonzero(m)
        if len(xs):
            x1, y1, x2, y2 = box
            assert xs.min() >= int(x1) - 1 and xs.max() <= int(x2) + 1
            assert ys.min() >= int(y1) - 1 and ys.max() <= int(y2) + 1
    res.plot()  # mask overlay draws


def test_pose_predict_results():
    res, img = _predict("PoseModel", "tiny-pose.yaml")
    assert res.keypoints is not None and len(res.keypoints) == len(res.boxes)
    k = res.keypoints
    assert k.data.ndim == 3 and k.data.shape[-1] in (2, 3)
    h, w = img.shape[:2]
    assert (k.xy[..., 0] >= 0).all() and (k.xy[..., 0] <= w).all()
    assert (k.xy[..., 1] >= 0).all() and (k.xy[..., 1] <= h).all()
    res.plot()


def test_obb_predict_results():
    res, img = _predict("OBBModel", "tiny-obb.yaml")
    assert res.boxes is None and res.obb is not None and len(res) == len(res.obb)
    assert res.obb.data.shape[-1] == 7
    corners = res.obb.xyxyxyxy
    assert corners.shape == (len(res.obb), 4, 2)
    res.plot()


def test_detect_predict_unchanged():
    res, img = _predict("DetectionModel", "tiny.yaml")
    assert res.masks is None and res.keypoints is None and res.obb is None
    assert res.boxes is not None


def test_classify_predict_results():
    from experiment_yolo_tpu.models.classify import ClassificationModel

    model = ClassificationModel(str(ASSETS / "tiny.yaml"), nc=4)
    variables = model.init(jax.random.PRNGKey(0))
    img = np.random.RandomState(5).randint(0, 255, (48, 96, 3), np.uint8)
    pred = DetectionPredictor(model, variables, overrides={"imgsz": 64})
    res = pred(img)[0]
    assert res.probs is not None and res.boxes is None
    assert res.probs.data.shape == (4,)
    np.testing.assert_allclose(res.probs.data.sum(), 1.0, atol=1e-5)
    assert 0 <= res.probs.top1 < 4 and len(res.probs.top5) <= 5


def test_results_tojson_verbose_save_crop(tmp_path):
    """Results API parity: tojson / verbose / save_crop (reference
    engine/results.py:273-360)."""
    import json

    import numpy as np

    from experiment_yolo_tpu.engine.results import Results

    img = np.full((100, 200, 3), 90, np.uint8)
    boxes = np.array([[10, 10, 60, 60, 0.9, 0], [80, 20, 150, 90, 0.7, 0],
                      [20, 30, 90, 80, 0.6, 2]], np.float32)
    res = Results(img, "x.jpg", {0: "person", 2: "car"}, boxes)

    recs = json.loads(res.tojson())
    assert len(recs) == 3 and recs[0]["name"] == "person"
    norm = json.loads(res.tojson(normalize=True))
    assert 0 <= norm[0]["box"]["x2"] <= 1

    v = res.verbose()
    assert "2 persons" in v and "1 car" in v
    assert Results(img, "x.jpg", {}, np.zeros((0, 6), np.float32)).verbose() == "(no detections), "

    res.save_crop(tmp_path, "im.jpg")
    assert (tmp_path / "person" / "im.jpg").exists()
    assert (tmp_path / "person" / "im1.jpg").exists()
    assert (tmp_path / "car" / "im2.jpg").exists()
