"""Pipeline parallelism on the 8-virtual-device CPU mesh: GPipe microbatch
rotation must reproduce the sequential program exactly."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.parallel.pipeline import (
    make_mesh_pipe, pipeline_apply, sam_encoder_pipeline, stack_stage_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_pipeline_generic_stages():
    """4 Dense+gelu stages over a 4-deep pipe, 8 microbatches: output equals
    the sequential composition for every microbatch (order preserved)."""
    dim = 32
    mlp = nn.Dense(dim)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (16, dim))
    stage_trees = [mlp.init(k, x0)["params"] for k in keys]

    def stage_fn(p, x):
        return jax.nn.gelu(mlp.apply({"params": p}, x))

    want = x0
    for p in stage_trees:
        want = stage_fn(p, want)

    mesh = make_mesh_pipe(4)
    x_mb = x0.reshape(8, 2, dim)
    got = pipeline_apply(stage_fn, stack_stage_params(stage_trees), x_mb, mesh)
    np.testing.assert_allclose(
        np.asarray(got.reshape(16, dim)), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_pipeline_sam_encoder():
    """SAM ViT encoder with its block stack pipelined over 4 stages matches
    the single-device encoder."""
    from experiment_yolo_tpu.models import sam as samlib

    samlib.SAM_CFGS["vit_pipe_test"] = (64, 4, 4, ())  # all-windowed: uniform
    try:
        enc = samlib.ImageEncoderViT(variant="vit_pipe_test", img_size=64, out_chans=32)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
        variables = enc.init(jax.random.PRNGKey(0), x)
        want = enc.apply(variables, x)

        mesh = make_mesh_pipe(4)
        fn = sam_encoder_pipeline(enc, variables, mesh)
        got = fn(x, microbatches=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
    finally:
        samlib.SAM_CFGS.pop("vit_pipe_test", None)


def test_pipeline_rejects_nonuniform_variant():
    from experiment_yolo_tpu.models import sam as samlib

    enc = samlib.ImageEncoderViT(variant="vit_b", img_size=64)
    mesh = make_mesh_pipe(4)
    with pytest.raises(ValueError, match="window settings"):
        sam_encoder_pipeline(enc, {"params": {}}, mesh)
