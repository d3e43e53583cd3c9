"""Worker for the 2-process multi-host smoke test (tests/test_multihost.py).

Each process: jax.distributed init via maybe_init_distributed (the trainer's
entry point), global 2-device mesh over 1 CPU device per process, per-host
sharded data loading, a jitted global-mean reduction over the sharded batch
(SPMD cross-host collective), and rank-0-only result writing.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

# multi-process CPU backend needs cross-host collectives (gloo ships in jaxlib)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp
import numpy as np


def main(data_dir: str, out_dir: str) -> None:
    from experiment_yolo_tpu.data.build import DataLoader
    from experiment_yolo_tpu.data.dataset import YOLODataset
    from experiment_yolo_tpu.parallel import mesh as meshlib

    rank = meshlib.maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert rank == int(os.environ["JAX_PROCESS_ID"])
    mesh = meshlib.make_mesh(2)

    ds = YOLODataset(data_dir, imgsz=96, augment=False, max_labels=16)
    loader = DataLoader(ds, batch_size=4, shuffle=True, workers=1, seed=0, shard_by_process=True)
    batch = next(iter(loader))
    assert batch["img"].shape[0] == 2, batch["img"].shape  # local slice of the global 4

    gbatch = meshlib.shard_batch(batch, mesh)
    assert gbatch["img"].shape[0] == 4  # global batch assembled across hosts

    @jax.jit
    def global_mean(b):
        return b["img"].astype(jnp.float32).mean(), b["cls"].astype(jnp.float32).sum()

    m, s = global_mean(gbatch)
    result = {
        "rank": rank,
        "global_mean": float(m),
        "cls_sum_global": float(s),
        "local_fingerprint": float(np.asarray(batch["img"], np.float64).sum()),
    }
    with open(os.path.join(out_dir, f"rank{rank}.json"), "w") as f:
        json.dump(result, f)
    # rank-0-only side effects (the trainer's checkpoint gating)
    if meshlib.is_main_process():
        with open(os.path.join(out_dir, "ckpt_rank0"), "w") as f:
            f.write("ok")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
