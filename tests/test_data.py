"""Data pipeline tests: synthetic dataset, augmentations, loader batching."""

import numpy as np
import pytest

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data import (
    DataLoader,
    YOLODataset,
    build_yolo_dataset,
    check_det_dataset,
    make_synthetic_dataset,
)
from experiment_yolo_tpu.data import augment as A


@pytest.fixture(scope="module")
def dataset_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(root, n_train=12, n_val=4, imgsz=160)


def test_check_det_dataset(dataset_yaml):
    d = check_det_dataset(dataset_yaml)
    assert d["nc"] == 3
    assert d["train"].is_dir() and d["val"].is_dir()
    assert d["names"][0] == "circle"


def test_letterbox_box_mapping():
    img = np.zeros((100, 200, 3), np.uint8)
    lab = {"img": img, "bboxes": np.asarray([[50.0, 25.0, 150.0, 75.0]], np.float32), "cls": np.asarray([0.0])}
    out = A.letterbox_labels(lab, 160)
    assert out["img"].shape == (160, 160, 3)
    r, (pw, ph) = out["ratio_pad"]
    assert r == pytest.approx(0.8)
    # box scaled by 0.8 and shifted by pads
    np.testing.assert_allclose(out["bboxes"][0], [40 + pw, 20 + ph, 120 + pw, 60 + ph], atol=0.5)


def test_mosaic_and_affine(dataset_yaml):
    d = check_det_dataset(dataset_yaml)
    cfg = get_cfg(overrides={"imgsz": 160, "max_labels": 64})
    ds = build_yolo_dataset(cfg, d["train"], mode="train")
    rng = np.random.default_rng(0)
    items = [ds._load_item(i) for i in range(4)]
    mos = A.mosaic4(items, 160, rng)
    assert mos["img"].shape == (320, 320, 3)
    assert (mos["bboxes"] >= 0).all() and (mos["bboxes"] <= 320).all()
    warped = A.random_perspective(mos, translate=0.1, scale=0.5, rng=rng)
    assert warped["img"].shape == (160, 160, 3)  # cropped by mosaic border
    assert len(warped["bboxes"]) == len(warped["cls"])


def test_flip_box_mapping():
    img = np.zeros((100, 100, 3), np.uint8)
    lab = {"img": img, "bboxes": np.asarray([[10.0, 20.0, 30.0, 40.0]], np.float32), "cls": np.asarray([0.0])}
    out = A.random_flip(lab, "horizontal", p=1.1)
    np.testing.assert_allclose(out["bboxes"][0], [70, 20, 90, 40])
    out = A.random_flip(lab, "vertical", p=1.1)
    np.testing.assert_allclose(out["bboxes"][0], [10, 60, 30, 80])


def test_train_loader_static_shapes(dataset_yaml):
    d = check_det_dataset(dataset_yaml)
    cfg = get_cfg(overrides={"imgsz": 160, "max_labels": 64})
    ds = build_yolo_dataset(cfg, d["train"], mode="train")
    loader = DataLoader(ds, batch_size=4, workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3  # 12 imgs / bs 4
    for b in batches:
        assert b["img"].shape == (4, 160, 160, 3)
        assert b["img"].dtype == np.uint8
        assert b["bboxes"].shape == (4, 64, 4)
        assert b["cls"].shape == (4, 64)
        assert b["mask"].shape == (4, 64)
    # at least one gt in the epoch, boxes normalized
    allmask = np.concatenate([b["mask"] for b in batches])
    assert allmask.any()
    allboxes = np.concatenate([b["bboxes"] for b in batches])
    assert (allboxes >= 0).all() and (allboxes <= 1).all()


def test_loader_determinism(dataset_yaml):
    d = check_det_dataset(dataset_yaml)
    cfg = get_cfg(overrides={"imgsz": 160, "max_labels": 64})
    ds = build_yolo_dataset(cfg, d["train"], mode="train")
    b1 = next(iter(DataLoader(ds, batch_size=4, workers=2, seed=7)))
    b2 = next(iter(DataLoader(ds, batch_size=4, workers=2, seed=7)))
    np.testing.assert_array_equal(b1["img"], b2["img"])
    np.testing.assert_array_equal(b1["bboxes"], b2["bboxes"])


def test_val_loader(dataset_yaml):
    d = check_det_dataset(dataset_yaml)
    cfg = get_cfg(overrides={"imgsz": 160, "max_labels": 64})
    ds = build_yolo_dataset(cfg, d["val"], mode="val")
    loader = DataLoader(ds, batch_size=4, shuffle=False, workers=2, drop_last=False)
    b = next(iter(loader))
    assert b["ori_shape"].shape == (4, 2)
    assert b["ratio_pad"].shape == (4, 3)
