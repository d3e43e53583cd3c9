"""Expert parallelism on the 8-virtual-device CPU mesh: a DynamicConv
(CondConv mixture-of-kernels) with its expert bank sharded over the
'expert' axis must match the unsharded program exactly — GSPMD turns the
expert contraction into per-device partial sums + all-reduce."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from experiment_yolo_tpu.parallel.expert import (
    EP_RULES, ep_shard, make_mesh_ep,
)
from experiment_yolo_tpu.parallel.tensor import tp_spec

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_ep_spec_rules():
    assert tp_spec("m/cond_weight", (4, 9, 16, 32), EP_RULES, 4, "expert") == P("expert", None, None, None)
    assert tp_spec("m/routing/kernel", (16, 4), EP_RULES, 4, "expert") == P(None, "expert")
    assert tp_spec("m/routing/bias", (4,), EP_RULES, 4, "expert") == P("expert")
    assert tp_spec("m/cv1/kernel", (3, 3, 16, 32), EP_RULES, 4, "expert") == P()
    # expert count not divisible by shards -> replicated, never an error
    assert tp_spec("m/cond_weight", (3, 9, 16, 32), EP_RULES, 4, "expert") == P()


def test_ep_dynamicconv_matches_unsharded():
    from experiment_yolo_tpu.nn.zoo_blocks import DynamicConv

    m = DynamicConv(32, 3, num_experts=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16))
    variables = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(variables, x)

    mesh = make_mesh_ep(2, 4)
    assert mesh.shape == {"data": 2, "expert": 4}
    vs = ep_shard(variables, mesh)
    flat = jax.tree_util.tree_flatten_with_path(vs)[0]
    sharded = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, v in flat
        if not v.sharding.is_fully_replicated
    ]
    assert any("cond_weight" in s for s in sharded)
    assert any("routing" in s for s in sharded)

    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(m.apply)(vs, xd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_ep_through_yaml_model():
    """A YAML-built model containing C2f_DynamicConv runs expert-sharded
    end-to-end (decode included) and matches the unsharded forward."""
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "C2f_DynamicConv", [32, True]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [[[3], 1, "Detect", ["nc"]]],
    }
    model = DetectionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    want_b, want_s = model.predict(variables, x)

    mesh = make_mesh_ep(2, 4)
    vs = ep_shard(variables, mesh)
    flat = jax.tree_util.tree_flatten_with_path(vs)[0]
    assert any(not v.sharding.is_fully_replicated for _, v in flat)
    got_b, got_s = jax.jit(model.predict)(vs, jax.device_put(x, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), atol=1e-5, rtol=1e-5)
