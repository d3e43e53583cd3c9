"""Tensor parallelism on the 8-virtual-device CPU mesh: Megatron-sharded
SAM ViT encoder must match the unsharded program exactly (GSPMD inserts the
all-reduces; rules only steer where the shards live)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from experiment_yolo_tpu.parallel.tensor import (
    SAM_VIT_TP_RULES, make_mesh_tp, tp_shard, tp_spec,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_tp_spec_rules():
    assert tp_spec("block_0/qkv/kernel", (64, 192), SAM_VIT_TP_RULES, 4) == P(None, "model")
    assert tp_spec("block_0/qkv/bias", (192,), SAM_VIT_TP_RULES, 4) == P("model")
    assert tp_spec("block_0/proj/kernel", (64, 64), SAM_VIT_TP_RULES, 4) == P("model", None)
    assert tp_spec("block_0/proj/bias", (64,), SAM_VIT_TP_RULES, 4) == P()
    assert tp_spec("b/mlp_lin1/kernel", (64, 256), SAM_VIT_TP_RULES, 4) == P(None, "model")
    assert tp_spec("b/mlp_lin2/kernel", (256, 64), SAM_VIT_TP_RULES, 4) == P("model", None)
    assert tp_spec("l0_mlp1/kernel", (64, 512), SAM_VIT_TP_RULES, 4) == P(None, "model")
    assert tp_spec("stem/kernel", (3, 3, 3, 64), SAM_VIT_TP_RULES, 4) == P()
    # non-divisible -> replicated, never an error
    assert tp_spec("b/qkv/kernel", (64, 194), SAM_VIT_TP_RULES, 4) == P()
    # decoder in-projections are COL-parallel (regression: the generic
    # proj/kernel row rule used to shadow them, splitting kernel and bias
    # across different dims); out_proj stays row-parallel
    assert tp_spec("dec/q_proj/kernel", (64, 64), SAM_VIT_TP_RULES, 4) == P(None, "model")
    assert tp_spec("dec/q_proj/bias", (64,), SAM_VIT_TP_RULES, 4) == P("model")
    assert tp_spec("dec/out_proj/kernel", (64, 64), SAM_VIT_TP_RULES, 4) == P("model", None)


@pytest.fixture()
def tiny_variant():
    from experiment_yolo_tpu.models import sam as samlib

    samlib.SAM_CFGS["vit_test"] = (64, 2, 4, (1,))  # dim, depth, heads, global
    yield "vit_test"
    samlib.SAM_CFGS.pop("vit_test", None)


def test_tp_vit_encoder_matches_unsharded(tiny_variant):
    from experiment_yolo_tpu.models.sam import ImageEncoderViT

    enc = ImageEncoderViT(variant=tiny_variant, img_size=64, out_chans=32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    want = enc.apply(variables, x)

    mesh = make_mesh_tp(2, 4)
    assert mesh.shape == {"data": 2, "model": 4}
    vs = tp_shard(variables, mesh)
    # at least the qkv/mlp kernels must actually be sharded
    flat = jax.tree_util.tree_flatten_with_path(vs)[0]
    sharded = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, v in flat
        if not v.sharding.is_fully_replicated
    ]
    assert any("qkv" in s for s in sharded) and any("mlp_lin1" in s for s in sharded)

    got = jax.jit(enc.apply)(vs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_tp_full_sam_box_prompt(tiny_variant):
    """Whole promptable pipeline (encoder + prompt encoder + two-way decoder)
    with TP-sharded params: masks/scores match the replicated run."""
    from experiment_yolo_tpu.models.sam import SAM

    sam = SAM(variant=tiny_variant, img_size=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 255.0
    boxes = jnp.asarray([[8.0, 8.0, 48.0, 48.0]])
    variables = sam.init(jax.random.PRNGKey(0), x, None, None)

    def run(v):
        embed = sam.apply(v, x, method=sam.encode)
        return sam.apply(v, embed, boxes, method=sam.decode_box_from_embedding)

    want = run(variables)
    mesh = make_mesh_tp(2, 4)
    got = jax.jit(run)(tp_shard(variables, mesh))
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4)
