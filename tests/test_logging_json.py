"""CSV metrics, results plotting, save_json, TensorBoard callback tests."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.engine.trainer import DetectionTrainer
from experiment_yolo_tpu.engine.validator import DetectionValidator
from experiment_yolo_tpu.nn.tasks import DetectionModel
from experiment_yolo_tpu.utils.integrations import add_tensorboard_callbacks, plot_results

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def dataset_yaml(tmp_path_factory):
    return make_synthetic_dataset(tmp_path_factory.mktemp("synth_log"), n_train=8, n_val=4, imgsz=128)


def test_results_csv_and_plot_and_tensorboard(dataset_yaml, tmp_path):
    model = DetectionModel(TINY)
    trainer = DetectionTrainer(
        model=model,
        variables=model.init(jax.random.PRNGKey(0)),
        overrides={
            "data": str(dataset_yaml), "epochs": 2, "batch": 8, "imgsz": 128,
            "workers": 2, "optimizer": "SGD", "warmup_epochs": 0.0, "val": True,
            "save": False, "amp": False, "max_labels": 32, "nbs": 8,
            "project": str(tmp_path / "runs"), "close_mosaic": 0,
        },
    )
    assert add_tensorboard_callbacks(trainer.callbacks)
    trainer.train()
    csv_path = trainer.save_dir / "results.csv"
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs
    assert "train/box" in lines[0] and "metrics/mAP50" in lines[0]
    png = plot_results(csv_path)
    assert png.exists() and png.stat().st_size > 1000
    # tensorboard event files written
    tb_files = list((trainer.save_dir / "tb").glob("events.out.tfevents.*"))
    assert tb_files, "no tensorboard event files"


def test_validator_save_json(dataset_yaml, tmp_path):
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    validator = DetectionValidator(
        args={
            "data": str(dataset_yaml), "imgsz": 128, "batch": 4, "max_labels": 32,
            "workers": 2, "save_json": True, "project": str(tmp_path / "runs"),
            "conf": 0.0005, "verbose": False,
        }
    )
    validator(model=model, variables=variables)
    out = tmp_path / "runs" / "predictions.json"
    assert out.exists()
    dets = json.loads(out.read_text())
    if dets:  # untrained model may emit some low-conf detections
        assert set(dets[0]) == {"image_id", "category_id", "bbox", "score"}
        assert len(dets[0]["bbox"]) == 4
