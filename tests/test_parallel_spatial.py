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
