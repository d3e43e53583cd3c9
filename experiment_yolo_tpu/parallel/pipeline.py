"""Pipeline parallelism — GPipe-style microbatch rotation over a 'pipe' axis.

The last of the five parallelism modes (data / fsdp / spatial / tensor /
pipeline): a stack of S identical stages lives one-per-device on a 'pipe'
mesh axis; M microbatches flow through the pipe with activations handed to
the next stage by ``lax.ppermute`` over ICI each step (the scaling-book
pipelining recipe, implemented with ``jax.shard_map``). Total steps =
M + S - 1; bubble fraction = (S-1)/(M+S-1).

Fit for transformer stacks with shape-preserving blocks (the SAM ViT
encoder here; an LLM decoder in general). Stages must be structurally
identical programs (SPMD): for the SAM encoder that means a variant whose
blocks share one window setting — the per-variant global-attention
exceptions (SAM_CFGS global_idx) make stock vit_b blocks non-uniform, so
the helper checks and refuses rather than silently diverging.

No reference counterpart (SURVEY.md §2.9: DDP only).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from experiment_yolo_tpu.parallel.mesh import make_mesh2d


def make_mesh_pipe(n_pipe: int, devices=None) -> Mesh:
    """1-D 'pipe' mesh over n_pipe devices."""
    return make_mesh2d(1, n_pipe, devices=devices, data_axis="data",
                       fsdp_axis="pipe")


def stack_stage_params(param_trees):
    """Stack S per-stage param pytrees into one tree with leading dim S
    (shard this dim over 'pipe')."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def pipeline_apply(stage_fn: Callable, stacked_params, x_mb: jnp.ndarray,
                   mesh: Mesh, axis: str = "pipe") -> jnp.ndarray:
    """Run M microbatches through S pipelined stages.

    Args:
        stage_fn: ``f(stage_params, x) -> y`` with ``y.shape == x.shape``
            (shape-preserving stage; same program on every device).
        stacked_params: pytree with leading dim S on every leaf
            (:func:`stack_stage_params`).
        x_mb: (M, mb, ...) microbatched input.
        mesh: mesh containing ``axis`` of size S.

    Returns:
        (M, mb, ...) outputs, microbatch order preserved.
    """
    S = mesh.shape[axis]
    M = x_mb.shape[0]

    def spmd(params_local, xs):
        s = jax.lax.axis_index(axis)
        p = jax.tree.map(lambda a: a[0], params_local)  # this device's stage
        perm = [(i, (i + 1) % S) for i in range(S)]
        # mark the replicated input as device-varying so the fori_loop carry
        # (which becomes varying after the first ppermute) type-checks
        xs = jax.lax.pcast(xs, axis, to="varying")

        def step(t, carry):
            recv, outs = carry
            # stage 0 pulls the next microbatch; others consume the handoff
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            inp = jnp.where(s == 0, feed, recv)
            y = stage_fn(p, inp)
            # the LAST stage's result for microbatch t-(S-1) is ready
            idx = t - (S - 1)
            cur = jax.lax.dynamic_index_in_dim(
                outs, jnp.clip(idx, 0, M - 1), 0, keepdims=False
            )
            upd = jnp.where(idx >= 0, y, cur)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, upd, jnp.clip(idx, 0, M - 1), 0
            )
            recv = jax.lax.ppermute(y, axis, perm)
            return recv, outs

        recv0 = jnp.zeros_like(xs[0])  # varying: inherits xs's vma
        outs0 = jnp.zeros_like(xs)
        _, outs = jax.lax.fori_loop(0, M + S - 1, step, (recv0, outs0))
        return outs[None]  # (1, M, ...) per device -> (S, M, ...) global

    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    out = jax.shard_map(
        spmd, mesh=mesh, in_specs=(pspec, P()), out_specs=P(axis),
    )(stacked_params, x_mb)
    return out[-1]  # only the last stage's buffer holds finished outputs


def sam_encoder_pipeline(enc, variables, mesh: Mesh, axis: str = "pipe"):
    """Pipeline the SAM ViT encoder's block stack over ``axis``.

    Patch embed + positional table and the conv neck run replicated (tiny
    cost); the S uniform groups of transformer blocks are pipelined.
    Requires depth % S == 0 and all blocks structurally identical (a
    variant with a single window setting). Returns ``fn(x, microbatches)``.
    """
    from experiment_yolo_tpu.models.sam import SAM_CFGS, _ViTBlock

    dim, depth, heads, global_idx = SAM_CFGS[enc.variant]
    S = mesh.shape[axis]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} pipeline stages")
    windows = {0 if i in global_idx else 14 for i in range(depth)}
    if len(windows) != 1:
        raise ValueError(
            "pipeline stages must be identical programs; variant "
            f"{enc.variant!r} mixes window settings {sorted(windows)}"
        )
    window = windows.pop()
    params = variables["params"]
    per_stage = depth // S
    # stage stacking depends only on variables/mesh: build once, not per call
    stage_trees = [
        stack_stage_params([params[f"block{s * per_stage + j}"] for j in range(per_stage)])
        for s in range(S)
    ]
    stacked = stack_stage_params(stage_trees)  # leaves (S, per_stage, ...)

    def fn(x, microbatches: int):
        b = x.shape[0]
        if b % microbatches:
            raise ValueError(f"batch {b} not divisible by {microbatches} microbatches")
        # replicated prologue: patch embed + pos table
        import flax.linen as nn

        g = enc.img_size // 16
        emb = nn.Conv(dim, (16, 16), strides=(16, 16), dtype=enc.dtype,
                      param_dtype=jnp.float32)
        y = emb.apply({"params": params["patch_embed"]}, x)
        pos = params["pos_embed"]
        if y.shape[1] != g:
            pos = jax.image.resize(pos, (1, y.shape[1], y.shape[2], dim), "bilinear")
        y = y + pos.astype(y.dtype)

        block = _ViTBlock(dim, heads, window=window, grid=(y.shape[1], y.shape[2]),
                          dtype=enc.dtype)

        def stage_fn(stage_params, z):
            for j in range(per_stage):
                z = block.apply({"params": jax.tree.map(lambda a: a[j], stage_params)}, z)
            return z

        y_mb = y.reshape(microbatches, b // microbatches, *y.shape[1:])
        y = pipeline_apply(stage_fn, stacked, y_mb, mesh, axis)
        y = y.reshape(b, *y.shape[2:])

        # replicated epilogue: conv neck (mirrors ImageEncoderViT.__call__)
        neck1 = nn.Conv(enc.out_chans, (1, 1), use_bias=False, dtype=enc.dtype,
                        param_dtype=jnp.float32)
        y = neck1.apply({"params": params["neck_conv1"]}, y)
        y = _apply_ln2d(y, params["neck_ln1_w"], params["neck_ln1_b"])
        neck2 = nn.Conv(enc.out_chans, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                        dtype=enc.dtype, param_dtype=jnp.float32)
        y = neck2.apply({"params": params["neck_conv2"]}, y)
        return _apply_ln2d(y, params["neck_ln2_w"], params["neck_ln2_b"])

    return fn


def _apply_ln2d(x, w, b):
    """Channel LayerNorm2d with explicit params (models/sam.py:ln2d_core)."""
    from experiment_yolo_tpu.models.sam import ln2d_core

    return ln2d_core(x, w, b)
