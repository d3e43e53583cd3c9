"""Rect validation batching tests (reference data/base.py:set_rectangle)."""

from pathlib import Path

import cv2
import jax
import numpy as np
import pytest

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data import DataLoader, build_yolo_dataset, check_det_dataset
from experiment_yolo_tpu.engine.validator import DetectionValidator
from experiment_yolo_tpu.nn.tasks import DetectionModel
from experiment_yolo_tpu.utils import yaml_save

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def wide_tall_dataset(tmp_path_factory):
    """Images with mixed aspect ratios + simple box labels."""
    root = tmp_path_factory.mktemp("rect")
    rng = np.random.RandomState(0)
    shapes = [(100, 300), (120, 280), (300, 100), (280, 120), (200, 200), (160, 240), (240, 160), (180, 180)]
    img_dir = root / "images" / "val"
    lab_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    for i, (h, w) in enumerate(shapes):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
        (lab_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    yaml_save(root / "data.yaml", {"path": str(root), "train": "images/val", "val": "images/val", "nc": 3, "names": ["a", "b", "c"]})
    return root / "data.yaml"


def test_rect_batches_group_by_aspect(wide_tall_dataset):
    d = check_det_dataset(wide_tall_dataset)
    cfg = get_cfg(overrides={"imgsz": 192, "max_labels": 8})
    ds = build_yolo_dataset(cfg, d["val"], mode="val")
    loader = DataLoader(ds, batch_size=4, shuffle=False, workers=2, drop_last=False, rect=True, stride=32)
    shapes = [b["img"].shape[1:3] for b in loader]
    # wide images batch -> short+wide shape; tall batch -> tall+narrow
    assert shapes[0][0] <= shapes[0][1]  # first batch: smallest h/w aspects
    assert shapes[1][0] >= shapes[1][1]
    # all stride-rounded
    for h, w in shapes:
        assert h % 32 == 0 and w % 32 == 0
    # labels normalized within each rect shape
    for b in loader:
        assert (b["bboxes"] >= 0).all() and (b["bboxes"] <= 1).all()


def test_rect_val_runs_and_matches_square(wide_tall_dataset):
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    base = {"data": str(wide_tall_dataset), "imgsz": 192, "batch": 4, "max_labels": 8,
            "workers": 2, "conf": 0.001, "verbose": False}
    sq = DetectionValidator(args=base)(model=model, variables=variables)
    rc = DetectionValidator(args={**base, "rect": True})(model=model, variables=variables)
    # untrained model: both near zero; rect must not crash and must produce
    # the same metric keys
    assert set(sq) == set(rc)
