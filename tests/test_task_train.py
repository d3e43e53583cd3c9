"""End-to-end Segment/Pose/OBB training on synthetic task datasets.

Counterpart of the reference task trainers (models/yolo/{segment,pose,obb})
exercised the way test_trainer.py exercises detect: tiny model, tiny data,
real train loop + task validator; asserts a marked loss decrease and a
finite metric dict from the matching validator.
"""

from pathlib import Path

import numpy as np
import pytest

from experiment_yolo_tpu.data.synthetic import make_synthetic_task_dataset
from experiment_yolo_tpu.engine.model import YOLO

ASSETS = Path(__file__).parent / "assets"


def _train(task, model_yaml, data_yaml, tmp_path, epochs=8, **kw):
    m = YOLO(str(model_yaml), task=task)
    losses = []

    def grab(trainer):
        losses.append(sum(trainer.loss_items.values()))

    overrides = dict(
        data=str(data_yaml), epochs=epochs, batch=8, imgsz=128, workers=2,
        optimizer="AdamW", lr0=0.003, warmup_epochs=1.0, val=False, save=False,
        amp=False, max_labels=32, nbs=8, project=str(tmp_path / "runs"),
        mosaic=0.0, close_mosaic=0,
    )
    overrides.update(kw)
    from experiment_yolo_tpu.engine.trainer import DetectionTrainer

    trainer = DetectionTrainer(model=m.model, variables=m.variables, overrides=overrides)
    trainer.callbacks.add("on_fit_epoch_end", grab)
    trainer.train()
    m.variables = trainer.ema_variables
    m.model = trainer.model
    return m, trainer, losses


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    return make_synthetic_task_dataset(tmp_path_factory.mktemp("seg"), "segment", n_train=16, n_val=8, imgsz=128)


@pytest.fixture(scope="module")
def pose_data(tmp_path_factory):
    return make_synthetic_task_dataset(tmp_path_factory.mktemp("pose"), "pose", n_train=16, n_val=8, imgsz=128)


@pytest.fixture(scope="module")
def obb_data(tmp_path_factory):
    return make_synthetic_task_dataset(tmp_path_factory.mktemp("obb"), "obb", n_train=16, n_val=8, imgsz=128)


def test_segment_train_and_val(seg_data, tmp_path):
    # the area-normalized mask BCE dominates early and moves slowly on a
    # 16-image set; a few more epochs give a clean monotonic fall
    m, trainer, losses = _train("segment", ASSETS / "tiny-seg.yaml", seg_data, tmp_path, epochs=14, lr0=0.005)
    assert losses[-1] < losses[0] * 0.85, f"seg loss did not decrease: {losses}"
    assert "seg" in trainer.loss_items
    stats = m.val(data=str(seg_data), imgsz=128, batch=8, workers=2, max_labels=32)
    assert np.isfinite(stats["fitness"])
    assert "mask_mAP50" in stats and "box_mAP50" in stats


def test_pose_train_and_val(pose_data, tmp_path):
    # the OKS term (1 - exp(-e)) saturates for far keypoints (vanishing
    # gradient until boxes localize), so the total falls slower than detect
    m, trainer, losses = _train("pose", ASSETS / "tiny-pose.yaml", pose_data, tmp_path, epochs=14, lr0=0.005)
    assert losses[-1] < losses[0] * 0.9, f"pose loss did not decrease: {losses}"
    assert "pose" in trainer.loss_items and "kobj" in trainer.loss_items
    assert tuple(m.model.kpt_shape) == (5, 3)  # dataset kpt_shape adopted
    stats = m.val(data=str(pose_data), imgsz=128, batch=8, workers=2, max_labels=32)
    assert np.isfinite(stats["fitness"])
    assert "pose_mAP50" in stats


def test_obb_train_and_val(obb_data, tmp_path):
    m, trainer, losses = _train("obb", ASSETS / "tiny-obb.yaml", obb_data, tmp_path, epochs=14, lr0=0.005)
    assert losses[-1] < losses[0] * 0.88, f"obb loss did not decrease: {losses}"
    stats = m.val(data=str(obb_data), imgsz=128, batch=8, workers=2, max_labels=32)
    assert np.isfinite(stats["fitness"])


def test_task_checkpoint_roundtrip(seg_data, tmp_path):
    """Task class survives a save/load cycle (meta.yaml carries task)."""
    from experiment_yolo_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from experiment_yolo_tpu.nn.tasks import SegmentationModel

    m = YOLO(str(ASSETS / "tiny-seg.yaml"), task="segment")
    save_checkpoint(tmp_path / "ck", m.model, m.variables)
    m2, v2 = load_checkpoint(tmp_path / "ck")
    assert isinstance(m2, SegmentationModel) and m2.task == "segment"
