"""Sliced (SAHI-style) inference: grid math, merge affine, end-to-end run.

Reference counterpart: examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py
(slice 512, overlap 0.2 via the sahi library)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.engine.sliced import SlicedPredictor, slice_grid
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


def test_slice_grid_covers_and_overlaps():
    s, ov = 512, 0.2
    for h, w in [(1080, 1920), (512, 512), (300, 700), (513, 513)]:
        grid = slice_grid(h, w, s, ov)
        ys = sorted({y for y, _ in grid})
        xs = sorted({x for _, x in grid})
        # full coverage: last slice flush with the edge (or origin if small)
        assert ys[-1] == max(h - s, 0) and xs[-1] == max(w - s, 0)
        assert ys[0] == 0 and xs[0] == 0
        # stride respects the overlap ratio
        for seq, extent in ((ys, h), (xs, w)):
            for a, b in zip(seq, seq[1:]):
                assert b - a <= int(s * (1 - ov))


class _FakeModel:
    """Deterministic stand-in: every slice 'detects' one box at a fixed
    slice-local position, so the global merge math is exactly checkable."""

    strides = (8, 16, 32)
    names = {0: "obj"}
    nc = 1

    def predict(self, variables, x):
        n = x.shape[0]
        a = 8  # anchors per slice
        # xywh (model.predict convention): center (100,120), size 40x60
        boxes = jnp.tile(jnp.asarray([[100.0, 120.0, 40.0, 60.0]]), (n, a, 1))
        # only anchor 0 is confident; rest below conf threshold
        scores = jnp.concatenate(
            [jnp.full((n, 1, 1), 0.9), jnp.full((n, a - 1, 1), 0.001)], axis=1
        )
        return boxes, scores


def test_merge_affine_places_boxes_globally():
    pred = SlicedPredictor(_FakeModel(), {}, overrides={"conf": 0.25, "verbose": False},
                           slice=512, overlap=0.2, include_full=False)
    img = np.zeros((600, 900, 3), np.uint8)
    res = pred([img])
    assert len(res) == 1
    d = res[0].boxes.data  # (n, 6) x1,y1,x2,y2,conf,cls
    grid = slice_grid(600, 900, 512, 0.2)
    want = {(x0 + 80.0, y0 + 90.0, x0 + 120.0, y0 + 150.0) for y0, x0 in grid}
    got = {tuple(np.round(b[:4], 3)) for b in np.asarray(d)}
    # every surviving box must be one of the per-slice fakes in GLOBAL coords
    assert got <= want and len(got) >= 1
    # the fake boxes from distinct slices do not overlap in global coords
    # (40x60 box, slice origins >= 88 px apart), so the global NMS keeps all
    assert len(got) == len(want)


@pytest.mark.parametrize("include_full", [False, True])
def test_sliced_predict_real_model_runs(include_full):
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    pred = SlicedPredictor(model, variables,
                           overrides={"conf": 0.01, "imgsz": 64, "verbose": False},
                           slice=64, overlap=0.25, include_full=include_full)
    img = (np.random.RandomState(0).rand(150, 200, 3) * 255).astype(np.uint8)
    res = pred([img])
    assert len(res) == 1
    d = np.asarray(res[0].boxes.data)
    if len(d):
        assert d[:, 0].min() >= 0 and d[:, 2].max() <= 200
        assert d[:, 1].min() >= 0 and d[:, 3].max() <= 150


def test_facade_sliced_predict():
    from experiment_yolo_tpu.engine.model import YOLO

    m = YOLO(TINY)
    img = (np.random.RandomState(1).rand(100, 130, 3) * 255).astype(np.uint8)
    res = m.sliced_predict([img], slice=64, overlap=0.2, imgsz=64, conf=0.01)
    assert len(res) == 1


def test_nms_max_wh_exceeds_image_dim():
    """Regression: sliced NMS runs in original-image pixels — the class
    offset must exceed the largest dimension (satellite frames > 7680px)."""
    from experiment_yolo_tpu.engine.sliced import nms_max_wh

    assert nms_max_wh(640, 640) == 7680.0
    assert nms_max_wh(100, 10000) > 10000
    assert nms_max_wh(40000, 100) > 40000
