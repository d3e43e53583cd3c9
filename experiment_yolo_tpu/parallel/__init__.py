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
from experiment_yolo_tpu.parallel.pipeline import (
    make_mesh_pipe,
    pipeline_apply,
    sam_encoder_pipeline,
    stack_stage_params,
)
from experiment_yolo_tpu.parallel.tensor import (
    SAM_VIT_TP_RULES,
    make_mesh_tp,
    tp_shard,
    tp_shardings,
    tp_spec,
)
from experiment_yolo_tpu.parallel.expert import (
    EP_RULES,
    ep_shard,
    ep_shardings,
    make_mesh_ep,
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
    "SAM_VIT_TP_RULES",
    "make_mesh_pipe",
    "make_mesh_tp",
    "pipeline_apply",
    "sam_encoder_pipeline",
    "stack_stage_params",
    "tp_shard",
    "tp_shardings",
    "tp_spec",
    "EP_RULES",
    "ep_shard",
    "ep_shardings",
    "make_mesh_ep",
]
