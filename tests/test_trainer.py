"""End-to-end training tests on the synthetic dataset (tiny model, CPU).

The 8-virtual-device CPU mesh (conftest) means these tests also exercise
the data-parallel sharding path: batch 8 over 8 devices.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.engine.checkpoint import load_checkpoint
from experiment_yolo_tpu.engine.trainer import DetectionTrainer, EarlyStopping
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def dataset_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    return make_synthetic_dataset(root, n_train=16, n_val=8, imgsz=128)


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es(0, 0.5)
    assert not es(1, 0.4)
    assert es(2, 0.3)  # 2 epochs without improvement
    es2 = EarlyStopping(patience=2)
    assert not es2(0, 0.5)
    assert not es2(1, 0.6)  # improves, resets
    assert not es2(2, 0.5)
    assert es2(3, 0.5)


def test_train_loss_decreases_and_checkpoints(dataset_yaml, tmp_path):
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = DetectionTrainer(
        model=model,
        variables=variables,
        overrides={
            "data": str(dataset_yaml),
            "epochs": 2,
            "batch": 8,
            "imgsz": 128,
            "workers": 2,
            "optimizer": "SGD",
            "lr0": 0.01,
            "warmup_epochs": 0.0,
            "val": True,
            "save": True,
            "amp": False,
            "max_labels": 32,
            "nbs": 8,  # no grad accumulation in the test
            "project": str(tmp_path / "runs"),
            "close_mosaic": 0,
            "ema": True,
            "plots": True,
        },
    )
    # capture first/last epoch loss via loss_items
    losses = []
    trainer.callbacks.add("on_fit_epoch_end", lambda trainer: losses.append(dict(trainer.loss_items)))
    results = trainer.train()
    assert results["epochs_run"] == 2
    assert "mAP50" in results  # validator ran
    total0 = sum(losses[0].values())
    total1 = sum(losses[-1].values())
    assert np.isfinite(total0) and np.isfinite(total1)
    assert total1 < total0 * 1.5  # sanity: not diverging

    # checkpoint round-trip
    ckpt = trainer.save_dir / "weights" / "last"
    assert (ckpt / "meta.yaml").exists()
    # plots=True saved first-epoch train-batch mosaics (utils/plotting.py)
    assert (trainer.save_dir / "train_batch0.jpg").exists()
    m2, v2 = load_checkpoint(ckpt)
    assert m2.nc == 3
    n1 = model.num_params(trainer.ema_variables)
    n2 = m2.num_params(v2)
    assert n1 == n2
    # loaded EMA weights equal trained EMA weights
    l1 = jax.tree.leaves(trainer.ema_variables["params"])
    l2 = jax.tree.leaves(v2["params"])
    np.testing.assert_allclose(np.asarray(l1[0]), np.asarray(l2[0]), atol=1e-6)


def test_train_sgd_decreases_loss_markedly(dataset_yaml, tmp_path):
    """Train longer on a tiny slice and require a real loss reduction."""
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = DetectionTrainer(
        model=model,
        variables=variables,
        overrides={
            "data": str(dataset_yaml),
            "epochs": 15,
            "batch": 8,
            "imgsz": 128,
            "workers": 2,
            "optimizer": "AdamW",
            "lr0": 0.003,
            "warmup_epochs": 1.0,
            "val": False,
            "save": False,
            "amp": False,
            "max_labels": 32,
            "nbs": 8,
            "project": str(tmp_path / "runs"),
            "mosaic": 0.0,  # deterministic-ish letterbox path
            "close_mosaic": 0,
        },
    )
    losses = []
    trainer.callbacks.add("on_fit_epoch_end", lambda trainer: losses.append(sum(trainer.loss_items.values())))
    trainer.train()
    assert losses[-1] < losses[0] * 0.8, f"loss did not decrease: {losses}"
