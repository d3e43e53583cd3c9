"""Tensor parallelism — Megatron-style parameter sharding over a 'model' axis.

For the transformer-heavy models in the zoo (SAM's ViT image encoder is the
big one: vit_h is ~630M params, far beyond what a v5e chip wants resident
next to activations at 1024x1024), parameters are sharded column-wise on the
up-projections (qkv, mlp in) and row-wise on the down-projections (attn out,
mlp out); GSPMD propagates the shardings through the attention/MLP compute
and inserts the all-reduces over ICI — the scaling-book Megatron recipe with
no model-code changes.

Sharding rules are (regex on the param path, dim to shard) pairs; anything
unmatched stays replicated. Math is exact regardless of alignment (GSPMD
reshards as needed), so the rules are a performance choice, not a
correctness one.

No reference counterpart (SURVEY.md §2.9: the reference has data parallelism
only); TPU-native added capability like parallel/spatial.py.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from experiment_yolo_tpu.parallel.mesh import make_mesh2d


def make_mesh_tp(n_data: int, n_model: int, devices=None) -> Mesh:
    """(n_data, n_model) mesh with axes ('data', 'model'); model inner so the
    per-layer all-reduces ride neighbouring ICI links."""
    return make_mesh2d(
        n_data, n_model, devices=devices, data_axis="data", fsdp_axis="model"
    )


# Megatron pattern for the SAM ViT encoder + two-way decoder (models/sam.py):
# column-parallel up-projections, row-parallel down-projections.
SAM_VIT_TP_RULES: List[Tuple[str, int]] = [
    # first match wins: the decoder in-projection rule must precede the
    # generic proj/kernel rule, which would otherwise row-shard
    # q_proj/k_proj/v_proj kernels while their biases go col-parallel
    (r"[qkv]_proj/(kernel|bias)$", -1),  # prompt-decoder attention in-projs
    (r"qkv/(kernel|bias)$", -1),       # (D, 3D) col-parallel; bias follows
    (r"proj/kernel$", 0),              # (D, D) row-parallel; bias replicated
    (r"mlp_lin1/(kernel|bias)$", -1),  # (D, 4D) col-parallel
    (r"mlp_lin2/kernel$", 0),          # (4D, D) row-parallel
    (r"mlp1/(kernel|bias)$", -1),
    (r"mlp2/kernel$", 0),
]


def tp_spec(path: str, shape, rules, n_shards: int, axis: str = "model") -> P:
    """PartitionSpec for one parameter: first matching rule shards that dim
    (negative dims count from the end); non-divisible or unmatched ->
    replicated."""
    for pat, dim in rules:
        if re.search(pat, path):
            d = dim if dim >= 0 else len(shape) + dim
            if 0 <= d < len(shape) and shape[d] % n_shards == 0 and shape[d] >= n_shards:
                spec = [None] * len(shape)
                spec[d] = axis
                return P(*spec)
            return P()
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def tp_shard(tree, mesh: Mesh, rules=SAM_VIT_TP_RULES, axis: str = "model"):
    """Place a parameter pytree tensor-parallel-sharded over ``axis``."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: jax.device_put(
            x, NamedSharding(mesh, tp_spec(_path_str(p), np.shape(x), rules, n, axis))
        ),
        tree,
    )


def tp_shardings(tree, mesh: Mesh, rules=SAM_VIT_TP_RULES, axis: str = "model"):
    """The NamedSharding pytree matching ``tp_shard`` (for jit out_shardings)."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, tp_spec(_path_str(p), np.shape(x), rules, n, axis)),
        tree,
    )
