"""Spatial partitioning on the 8-virtual-device CPU mesh: H-sharded
inference must be numerically identical to the single-device program
(GSPMD halo exchange is semantics-preserving, unlike SAHI slicing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pathlib import Path

from experiment_yolo_tpu.parallel.spatial import (
    image_sharding, make_mesh_spatial, spatial_predict_fn,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


def _model():
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_spatial_matches_single_device():
    model, variables = _model()
    mesh = make_mesh_spatial(2, 4)
    assert mesh.shape == {"data": 2, "spatial": 4}
    # H=256, max stride 16, 4-way spatial: deepest level 16 rows -> 4/shard
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 256, 3))
    fn = spatial_predict_fn(model, variables, mesh)
    got = fn(jax.device_put(x, image_sharding(mesh)))
    want = model.predict(variables, x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4)


def test_spatial_indivisible_raises():
    model, variables = _model()
    mesh = make_mesh_spatial(2, 4)
    fn = spatial_predict_fn(model, variables, mesh)
    # 160 / (4 spatial * 16 stride) is not integral
    with pytest.raises(ValueError, match="divisible"):
        fn(jnp.zeros((2, 160, 160, 3)))


def test_spatial_train_step_matches():
    """Full TRAIN step (forward + BN batch stats + TAL + loss + grads + SGD)
    with the image H axis sharded: loss components and updated params must
    match the unsharded run — proves GSPMD handles the cross-shard BN
    reductions and halo exchanges in the backward pass too (high-res
    training is the use case: shard H to fit bigger drone frames)."""
    import numpy as onp

    from experiment_yolo_tpu.engine.trainer import DetectionTrainer, TrainState
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.optim.builders import build_optimizer
    from experiment_yolo_tpu.parallel.mesh import replicate

    model = DetectionModel(TINY)
    v0 = model.init(jax.random.PRNGKey(0))
    rng = onp.random.RandomState(0)
    batch_np = {
        "img": rng.randint(0, 255, (2, 128, 128, 3), onp.uint8),
        "bboxes": onp.asarray(rng.uniform(0.3, 0.6, (2, 4, 4)), onp.float32),
        "cls": onp.zeros((2, 4), onp.int32),
        "mask": onp.tile(onp.arange(4) < 2, (2, 1)),
    }

    def run(shard):
        variables = jax.tree.map(jnp.copy, v0)
        tr = DetectionTrainer(model=model, variables=variables, overrides={"amp": False})
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
        batch = {k: jnp.asarray(x) for k, x in batch_np.items()}
        if shard:
            mesh = make_mesh_spatial(2, 4)
            state = replicate(state, mesh)
            batch = {
                k: jax.device_put(x, image_sharding(mesh) if x.ndim == 4
                                  else jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
                for k, x in batch.items()
            }
        s2, comps = tr._make_train_step()(state, batch)
        return {k: float(x) for k, x in comps.items()}, jax.tree.map(np.asarray, s2.params)

    want_c, want_p = run(False)
    got_c, got_p = run(True)
    for k in want_c:
        np.testing.assert_allclose(got_c[k], want_c[k], atol=1e-3, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(got_p), jax.tree.leaves(want_p)):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_spatial_asf_flagship():
    """The DEAL flagship (ScalSeq/Zoom_cat multi-level fusion + P2 head)
    through 2-way spatial sharding — exercises halo exchange across the
    resize/concat fusion sites, not just plain convs."""
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel("yolov8-ASF-P2P2.yaml")
    variables = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh_spatial(2, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    fn = spatial_predict_fn(model, variables, mesh)
    got = fn(x)  # host array: jit shards it via the constraint
    want = model.predict(variables, x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4)


def test_predict_spatial_product_surface():
    """`spatial=N` as a user-facing predict key (VERDICT r3 item 5): the
    full predictor pipeline (letterbox -> jit forward -> NMS -> rescale) on
    a (data, spatial) mesh must produce the same detections as the
    single-device predictor, and bad configs must fail loudly at init."""
    import numpy as onp

    from experiment_yolo_tpu.engine.predictor import DetectionPredictor

    model, variables = _model()
    rng = onp.random.RandomState(3)
    img = rng.randint(0, 255, (320, 300, 3), onp.uint8)
    kw = {"imgsz": 256, "batch": 1, "conf": 0.001, "max_det": 20}

    base = DetectionPredictor(model, variables, overrides=kw)(img)[0]
    sp = DetectionPredictor(model, variables, overrides={**kw, "spatial": 4})(img)[0]
    assert sp.boxes.data.shape == base.boxes.data.shape
    np.testing.assert_allclose(sp.boxes.data, base.boxes.data, atol=1e-3, rtol=1e-3)

    # imgsz=160 not divisible by n_spatial*max_stride=64 -> init-time error
    with pytest.raises(ValueError, match="divisible"):
        DetectionPredictor(model, variables,
                           overrides={**kw, "imgsz": 160, "spatial": 4})
    # device count (8) not divisible by spatial=3 -> init-time error
    with pytest.raises(ValueError, match="device count"):
        DetectionPredictor(model, variables, overrides={**kw, "spatial": 3})
