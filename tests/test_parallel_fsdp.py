"""2-D (data x fsdp) parallelism on the 8-virtual-device CPU mesh:
params/opt-state sharded over 'fsdp', batch over 'data', full train step
runs and keeps its shardings (GSPMD inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from experiment_yolo_tpu.parallel import (
    batch_sharded, fsdp_shard, fsdp_shardings, fsdp_spec, make_mesh2d, shard_batch,
)


def test_fsdp_spec_rules():
    assert fsdp_spec((1024, 256), 4) == P(None, "fsdp")      # prefer last dim
    assert fsdp_spec((1026, 256), 4) == P(None, "fsdp")
    assert fsdp_spec((1024, 255), 4) == P("fsdp", None)      # fall back to largest divisible
    assert fsdp_spec((3, 3, 5, 7), 4) == P()                 # nothing divisible -> replicated
    assert fsdp_spec((8,), 4) == P()                         # too small -> replicated


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fsdp_train_step_2d_mesh():
    mesh = make_mesh2d(4, 2)
    assert mesh.shape == {"data": 4, "fsdp": 2}

    from experiment_yolo_tpu.engine.trainer import DetectionTrainer, TrainState
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.optim.builders import build_optimizer
    from experiment_yolo_tpu.utils.loss import LossConfig

    model = DetectionModel("yolov8n.yaml", nc=3)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = DetectionTrainer(model=model, variables=variables, overrides={"amp": False})
    trainer.loss_cfg = LossConfig(nc=3)
    trainer.tx = build_optimizer(
        variables["params"], "SGD", 0.01, 0.937, 5e-4, nb=10, epochs=10, lrf=0.01,
        cos_lr=False, warmup_epochs=1.0, warmup_bias_lr=0.1, warmup_momentum=0.8,
    )
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=trainer.tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        iou_mean=jnp.asarray(1.0, jnp.float32),
        step=jnp.zeros([], jnp.int32), ema_updates=jnp.zeros([], jnp.int32),
    )
    # params + opt + EMA sharded over fsdp; BN stats & scalars replicated
    state = state.replace(
        params=fsdp_shard(state.params, mesh),
        opt_state=fsdp_shard(state.opt_state, mesh),
        ema_params=fsdp_shard(state.ema_params, mesh),
    )
    rng = np.random.RandomState(0)
    b = 4  # one per data-mesh row
    batch = {
        "img": rng.randint(0, 255, (b, 64, 64, 3), dtype=np.uint8),
        "bboxes": np.full((b, 8, 4), 0.4, np.float32),
        "cls": np.zeros((b, 8), np.int32),
        "mask": np.tile(np.arange(8) < 2, (b, 1)),
    }
    with mesh:
        sharded_batch = shard_batch(batch, mesh)
        step = trainer._make_train_step()
        new_state, comps = step(state, sharded_batch)
        jax.block_until_ready(new_state.params)

    total = float(comps["box"]) + float(comps["cls"]) + float(comps["dfl"])
    assert np.isfinite(total)
    # a large parameter is still fsdp-sharded after the update
    big = [p for p in jax.tree.leaves(new_state.params) if p.size >= 2**14]
    assert big, "no large params found"
    assert any(
        getattr(p.sharding, "spec", P()) != P() for p in big
    ), "update lost the fsdp sharding"
    # and its shards really live on distinct devices
    p0 = next(p for p in big if getattr(p.sharding, "spec", P()) != P())
    assert len({s.device for s in p0.addressable_shards}) > 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_fsdp_config_plumbing():
    """fsdp: N in the trainer config builds the 2-D mesh and places the
    state sharded — the user-facing path for ZeRO-3-style training."""
    from experiment_yolo_tpu.engine.trainer import DetectionTrainer, TrainState
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.optim.builders import build_optimizer

    model = DetectionModel("yolov8n.yaml", nc=3)
    variables = model.init(jax.random.PRNGKey(0))
    tr = DetectionTrainer(model=model, variables=variables,
                          overrides={"amp": False, "fsdp": 2, "n_devices": 8})
    tr._setup_mesh()
    assert tr.mesh.shape == {"data": 4, "fsdp": 2}

    tr.tx = build_optimizer(
        variables["params"], "SGD", 0.01, 0.937, 5e-4, nb=10, epochs=10, lrf=0.01,
        cos_lr=False, warmup_epochs=1.0, warmup_bias_lr=0.1, warmup_momentum=0.8,
    )
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tr.tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        iou_mean=jnp.asarray(1.0, jnp.float32),
        step=jnp.zeros([], jnp.int32), ema_updates=jnp.zeros([], jnp.int32),
    )
    state = tr._place_state(state)
    big = [p for p in jax.tree.leaves(state.params) if p.size >= 2**14]
    assert any(getattr(p.sharding, "spec", P()) != P() for p in big)

    rng = np.random.RandomState(0)
    batch = shard_batch({
        "img": rng.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
        "bboxes": np.full((4, 8, 4), 0.4, np.float32),
        "cls": np.zeros((4, 8), np.int32),
        "mask": np.tile(np.arange(8) < 2, (4, 1)),
    }, tr.mesh)
    new_state, comps = tr._make_train_step()(state, batch)
    jax.block_until_ready(new_state.params)
    assert np.isfinite(float(comps["box"]) + float(comps["cls"]) + float(comps["dfl"]))
