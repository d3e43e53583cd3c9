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
from experiment_yolo_tpu.parallel.spatial import (
    image_sharding,
    make_mesh_spatial,
    spatial_predict_fn,
)

__all__ = [
    "batch_sharded",
    "fsdp_shard",
    "fsdp_shardings",
    "fsdp_spec",
    "image_sharding",
    "make_mesh",
    "make_mesh2d",
    "make_mesh_spatial",
    "replicate",
    "replicated",
    "shard_batch",
    "spatial_predict_fn",
]
