"""Device mesh + sharding helpers — the framework's parallelism layer.

TPU-native counterpart of the reference's DDP machinery (SURVEY.md §2.9):
the reference spawns ``torch.distributed.run`` subprocesses and wraps the
model in DDP over NCCL; here data parallelism is a named mesh axis. The
train step is written for the global batch; ``jit`` with these shardings
lets SPMD partitioning insert the gradient all-reduces over ICI.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(the trainer does this when run under multi-process launch); per-host data
loading shards by ``jax.process_index()``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis: str = "data", devices=None
) -> Mesh:
    """1-D data-parallel mesh over the first n devices.

    ``devices`` overrides device discovery (e.g. ``jax.devices("cpu")`` for a
    virtual host mesh when the default platform exposes fewer chips)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices and devices is None:
            # Default platform has too few chips (e.g. single-chip TPU via a
            # relay plugin): fall back to virtual host CPU devices, which
            # honour --xla_force_host_platform_device_count. Only for
            # discovered devices — an explicit too-short ``devices`` list is
            # a caller error and must raise, not silently switch platforms.
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devs = cpu
        devs = devs[:n_devices]
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices for the mesh, have {len(devs)}"
            )
    return Mesh(np.asarray(devs), (axis,))


def maybe_init_distributed() -> int:
    """Multi-host init (reference's dist.init_process_group equivalent).

    Call before building the mesh when launched as one process per host
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env, the
    standard jax.distributed contract). No-op single-process. Returns the
    process index (the reference's RANK)."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        # NB: must run before anything touches the XLA backend — even
        # jax.process_count() would initialize it, so no pre-checks here.
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=addr,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        try:
            jax.distributed.initialize(**kw)
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_index()


def is_main_process() -> bool:
    """Rank-0 check (reference's RANK in (-1, 0) gating)."""
    return jax.process_index() == 0


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch onto the mesh, batch-dim sharded.

    Single-process: a plain sharded device_put of the global batch.
    Multi-host: each process passes its LOCAL slice (the loader's
    ``shard_by_process`` output) and the global jax.Array is assembled from
    the per-process shards without any cross-host copy of the full batch."""
    sh = batch_sharded(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------------------
# 2-D (data x fsdp) parallelism — the scaling-book recipe: batch over 'data',
# parameters/optimizer state sharded over 'fsdp' (ZeRO-3 style); GSPMD
# inserts the all-gathers on use and reduce-scatters on the grads over ICI.
# ---------------------------------------------------------------------------


def make_mesh2d(
    n_data: int, n_fsdp: int, devices=None,
    data_axis: str = "data", fsdp_axis: str = "fsdp",
) -> Mesh:
    """(n_data, n_fsdp) mesh; data-parallel outer, parameter-shard inner.

    The fsdp axis is the FASTER-varying one so each parameter all-gather
    rides neighbouring ICI links."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_fsdp
    if len(devs) < need:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= need:
            devs = cpu
    if len(devs) < need:
        raise RuntimeError(f"need {need} devices, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_data, n_fsdp)
    return Mesh(arr, (data_axis, fsdp_axis))


def fsdp_spec(shape, n_shards: int, axis: str = "fsdp", min_size: int = 2**14) -> P:
    """PartitionSpec sharding the largest divisible dim over ``axis``.

    Small tensors (fewer than ``min_size`` elements) stay replicated — the
    all-gather latency would beat the memory win (scaling-book §sharding)."""
    size = int(np.prod(shape)) if shape else 0
    if size < min_size:
        return P()
    # prefer the last (output-feature) dim, then the largest divisible one
    order = sorted(range(len(shape)), key=lambda i: (i != len(shape) - 1, -shape[i]))
    for i in order:
        if shape[i] % n_shards == 0 and shape[i] >= n_shards:
            spec = [None] * len(shape)
            spec[i] = axis
            return P(*spec)
    return P()


def fsdp_shard(tree, mesh: Mesh, axis: str = "fsdp", min_size: int = 2**14):
    """Place a parameter/optimizer pytree FSDP-sharded over ``axis``."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(np.shape(x), n, axis, min_size))
        ),
        tree,
    )


def fsdp_shardings(tree, mesh: Mesh, axis: str = "fsdp", min_size: int = 2**14):
    """The NamedSharding pytree matching ``fsdp_shard`` (for jit out_shardings)."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec(np.shape(x), n, axis, min_size)), tree
    )
