"""Parallelism layer: device mesh + sharding helpers (DDP equivalent)."""

from experiment_yolo_tpu.parallel.mesh import batch_sharded, make_mesh, replicate, replicated, shard_batch

__all__ = ["batch_sharded", "make_mesh", "replicate", "replicated", "shard_batch"]
