"""Resume-training tests: full train-state round trip."""

from pathlib import Path

import jax
import numpy as np
import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.engine.trainer import DetectionTrainer
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


def _overrides(dataset_yaml, tmp_path, **kw):
    d = {
        "data": str(dataset_yaml),
        "batch": 8,
        "imgsz": 128,
        "workers": 2,
        "optimizer": "SGD",
        "lr0": 0.01,
        "warmup_epochs": 0.0,
        "val": False,
        "save": True,
        "amp": False,
        "max_labels": 32,
        "nbs": 8,
        "project": str(tmp_path / "runs"),
        "name": "run",
        "exist_ok": True,
        "close_mosaic": 0,
        "mosaic": 0.0,
    }
    d.update(kw)
    return d


def test_resume_restores_state(tmp_path, tmp_path_factory):
    dataset_yaml = make_synthetic_dataset(tmp_path_factory.mktemp("synth_resume"), n_train=16, n_val=4, imgsz=128)
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))

    # phase 1: 2 epochs
    t1 = DetectionTrainer(model=model, variables=variables, overrides=_overrides(dataset_yaml, tmp_path, epochs=2))
    t1.train()
    ckpt = t1.save_dir / "weights" / "last"
    assert (ckpt / "train_state").exists()
    step1 = int(jax.device_get(t1.state.step))
    assert step1 == 4  # 2 epochs x 2 batches

    # phase 2: resume to 4 epochs
    t2 = DetectionTrainer(
        model=model,
        variables=model.init(jax.random.PRNGKey(1)),  # different init: must be overwritten by resume
        overrides=_overrides(dataset_yaml, tmp_path, epochs=4, resume=str(ckpt)),
    )
    t2.train()
    step2 = int(jax.device_get(t2.state.step))
    assert step2 == 8  # continued, not restarted
    assert t2.metrics["epochs_run"] == 4

    # resumed params actually came from the checkpoint (not the fresh init)
    p_ckpt = jax.tree.leaves(t1.variables["params"])[0]
    # after 2 more epochs they differ from ckpt but share history: check the
    # optimizer momentum buffer is nonzero right away via another resume
    t3 = DetectionTrainer(
        model=model,
        variables=model.init(jax.random.PRNGKey(2)),
        overrides=_overrides(dataset_yaml, tmp_path, epochs=4, resume=True),  # auto-find latest
    )
    state, start_epoch, best = t3._load_resume_state(_template(t3, model))
    assert start_epoch == 4
    mom = jax.tree.leaves(state.opt_state)
    assert any(float(np.abs(np.asarray(m)).sum()) > 0 for m in mom if hasattr(m, "shape") and getattr(m, "size", 0) > 1)


def _template(trainer, model):
    import jax.numpy as jnp

    from experiment_yolo_tpu.engine.trainer import TrainState
    from experiment_yolo_tpu.optim.builders import build_optimizer
    from experiment_yolo_tpu.utils.loss import LossConfig

    v = model.init(jax.random.PRNGKey(3))
    trainer.tx = build_optimizer(
        v["params"], "SGD", 0.01, 0.937, 5e-4, nb=2, epochs=4, lrf=0.01,
        cos_lr=False, warmup_epochs=0.0, warmup_bias_lr=0.1, warmup_momentum=0.8,
    )
    return TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=trainer.tx.init(v["params"]),
        ema_params=jax.tree.map(jnp.copy, v["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, v["batch_stats"]),
        iou_mean=jnp.asarray(1.0, jnp.float32),
        step=jnp.zeros([], jnp.int32),
        ema_updates=jnp.zeros([], jnp.int32),
    )


def test_resume_true_picks_most_recent_run_by_mtime(tmp_path):
    """resume=True must pick the most recently written run, not the
    lexically-last one: `train10` sorts before `train2` but may be older
    (reference get_latest_run is mtime-based, utils/files.py)."""
    import os
    import time

    runs = tmp_path / "runs"
    for name, age in [("train10", 100), ("train2", 0)]:  # train2 is NEWER
        d = runs / name / "weights" / "last"
        d.mkdir(parents=True)
        (d / "train_state").mkdir()
        (d / "meta.yaml").write_text("epoch: 0\nbest_fitness: 0.0\n")
        t = time.time() - age
        os.utime(d / "train_state", (t, t))

    model = DetectionModel(TINY)
    t3 = DetectionTrainer(
        model=model,
        variables=model.init(jax.random.PRNGKey(0)),
        overrides={"data": "unused", "project": str(runs), "resume": True, "save": False, "val": False},
    )
    # orbax will fail to restore the empty dir — we only care which run was
    # chosen, so intercept the path via the raised error
    with pytest.raises(Exception) as ei:
        t3._load_resume_state(None)
    assert "train2" in str(ei.value) or "train2" in repr(ei.value)
