"""2-process multi-host smoke test (VERDICT r1 item 10).

Spawns two real processes that form a jax.distributed cluster over localhost,
build a shared 2-device CPU mesh, shard the data loader per host, assemble a
global jax.Array from per-process shards, and run a jitted cross-host
reduction. Counterpart of the reference's DDP spawn test surface
(engine/trainer.py:640-652 + data DistributedSampler)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from experiment_yolo_tpu.data import make_synthetic_dataset

REPO = Path(__file__).resolve().parents[1]
WORKER = REPO / "tests" / "helpers" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    yaml = make_synthetic_dataset(tmp_path / "ds", n_train=8, n_val=2, imgsz=96)
    data_dir = str(yaml.parent / "images" / "train")
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {
            **os.environ,
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
            # NB: do NOT inherit PYTHONPATH — the axon TPU plugin site dir
            # force-registers the single-chip TPU backend, which would win
            # backend selection and break the 2-process CPU cluster
            "PYTHONPATH": str(REPO),
        }
        env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER), data_dir, str(out_dir)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    r0 = json.loads((out_dir / "rank0.json").read_text())
    r1 = json.loads((out_dir / "rank1.json").read_text())
    # the global reduction agrees across hosts
    assert r0["global_mean"] == pytest.approx(r1["global_mean"])
    assert r0["cls_sum_global"] == pytest.approx(r1["cls_sum_global"])
    # the two hosts loaded DIFFERENT local slices of the global batch
    assert r0["local_fingerprint"] != r1["local_fingerprint"]
    # rank-0-only checkpoint gating
    assert (out_dir / "ckpt_rank0").exists()
