"""Parallelism layer: device mesh + sharding helpers (DDP/FSDP equivalent)."""

from experiment_yolo_tpu.parallel.mesh import (
    batch_sharded,
    fsdp_shard,
    fsdp_shardings,
    fsdp_spec,
    make_mesh,
    make_mesh2d,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharded",
    "fsdp_shard",
    "fsdp_shardings",
    "fsdp_spec",
    "make_mesh",
    "make_mesh2d",
    "replicate",
    "replicated",
    "shard_batch",
]
