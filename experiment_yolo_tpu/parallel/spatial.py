"""Spatial partitioning — shard the image H axis across chips.

The vision counterpart of sequence parallelism: for inputs too large for
one chip (high-resolution UAV/satellite frames, the reference's SAHI
sliced-inference use case at examples/YOLOv8-SAHI-Inference-Video), the
NHWC activation H dimension is sharded over a ``spatial`` mesh axis and
GSPMD partitions every convolution with halo exchanges over ICI —
mathematically identical to the single-chip program, unlike slice-based
inference which changes results at slice seams.

Composes with data parallelism on a 2-D ``(data, spatial)`` mesh: batch
over ``data``, rows over ``spatial``. The spatial axis is the inner
(faster-varying) one so halo exchanges ride neighbouring ICI links.

Training works the same way — shard the batch's image H and jit the train
step over the mesh; GSPMD inserts the cross-shard BatchNorm-statistics
reductions and backward halo exchanges (loss components and updated params
match the unsharded run: tests/test_parallel_spatial.py::
test_spatial_train_step_matches). Use case: high-resolution drone frames
whose activations don't fit one chip at a useful batch size.

No reference counterpart (the reference is single-GPU per image and slices
at the application level); this is TPU-native added capability per
SURVEY.md §2.9's "not present" list.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from experiment_yolo_tpu.parallel.mesh import make_mesh2d, replicate


def make_mesh_spatial(n_data: int, n_spatial: int, devices=None) -> Mesh:
    """(n_data, n_spatial) mesh with axes ('data', 'spatial')."""
    return make_mesh2d(
        n_data, n_spatial, devices=devices, data_axis="data", fsdp_axis="spatial"
    )


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding: batch over 'data', image rows over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def _check_divisible(imgsz: int, mesh: Mesh, max_stride: int) -> None:
    n_sp = mesh.shape["spatial"]
    if imgsz % (n_sp * max_stride) != 0:
        raise ValueError(
            f"spatial partitioning needs H divisible by n_spatial*max_stride "
            f"({n_sp}*{max_stride}); got H={imgsz}"
        )


def spatial_predict_fn(model, variables, mesh: Mesh):
    """Jitted ``fn(x) -> model.predict`` outputs with x H-sharded on the mesh.

    ``variables`` are placed replicated; the returned callable accepts a
    global NHWC float batch (caller uses ``jax.device_put(x,
    image_sharding(mesh))`` or passes a host array — jit re-shards either
    way via in_shardings). H must be divisible by n_spatial * max stride so
    every pyramid level shards evenly (GSPMD would otherwise pad).
    """
    max_stride = int(max(model.strides))
    variables = replicate(variables, mesh)
    in_sh = image_sharding(mesh)

    @jax.jit
    def fn(x):
        _check_divisible(x.shape[1], mesh, max_stride)
        xs = jax.lax.with_sharding_constraint(x, in_sh)
        return model.predict(variables, xs)

    return fn
