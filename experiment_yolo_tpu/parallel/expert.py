"""Expert parallelism — sharding mixture-of-kernels convs over an 'expert' axis.

The zoo's conditionally-parameterized convolutions (``DynamicConv`` /
CondConv, reference extra_modules/block.py:4768; ODConv's kernel-attention
branch is the same shape) are dense mixtures of experts: every sample's
kernel is sum_e r[b,e] * W[e], with routing r from a pooled projection.
Expert parallelism shards the expert dimension of the kernel bank across an
'expert' mesh axis: each device holds E/n experts, computes its experts'
contribution to the output einsum (``bhwtc,etco,be->bhwo`` — the contraction
over ``e`` becomes per-device partial sums), and GSPMD inserts the
all-reduce over ICI. This is the MoE partial-sum + combine pattern
(scaling-book EP recipe) in its dense-routing form — there is no
capacity-based token dispatch because CondConv routes every sample to every
expert with a scalar weight.

Sharding rules follow parallel/tensor.py's (regex, dim) convention; the
routing projection's output dim is co-sharded so each device computes only
its own experts' routing logits. Math is exact regardless of placement
(GSPMD reshards as needed).

No reference counterpart (SURVEY.md §2.9: the reference has data parallelism
only); TPU-native added capability like parallel/{spatial,tensor,pipeline}.
"""

from __future__ import annotations

from typing import List, Tuple

from jax.sharding import Mesh

from experiment_yolo_tpu.parallel.mesh import make_mesh2d
from experiment_yolo_tpu.parallel.tensor import tp_shard, tp_shardings

# DynamicConv (zoo_blocks.py:1121): cond_weight (E, k*k, cin/g, cout),
# routing Dense (C, E). ODConv2d's attention branches stay replicated (their
# expert axis is folded into fused kernels at tiny sizes).
EP_RULES: List[Tuple[str, int]] = [
    (r"cond_weight$", 0),      # the expert kernel bank
    (r"routing/kernel$", -1),  # per-expert routing logits, col-parallel
    (r"routing/bias$", 0),
]


def make_mesh_ep(n_data: int, n_expert: int, devices=None) -> Mesh:
    """(n_data, n_expert) mesh with axes ('data', 'expert'); expert inner so
    the combine all-reduce rides neighbouring ICI links."""
    return make_mesh2d(
        n_data, n_expert, devices=devices, data_axis="data", fsdp_axis="expert"
    )


def ep_shard(tree, mesh: Mesh):
    """Place a parameter pytree expert-parallel-sharded over 'expert'."""
    return tp_shard(tree, mesh, rules=EP_RULES, axis="expert")


def ep_shardings(tree, mesh: Mesh):
    """The NamedSharding pytree matching ``ep_shard``."""
    return tp_shardings(tree, mesh, rules=EP_RULES, axis="expert")
