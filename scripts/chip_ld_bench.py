"""Chip session: DEAL-YOLO-LD (yolov8-LD-P2) throughput measurement.

VERDICT round-3 item #1: the paper's headline 0.914M model
(reference README.md:61,63; LDConv at reference nn/modules/conv.py:350-480)
had no measured chip numbers. LDConv's internal row-chunk `lax.scan`
faults the TPU worker when nested inside bench.py's outer timing scan,
so both legs here use the loop-mode protocol (carry chained across jit
calls, 50-vs-5-call delta timing) — which is also the production
dispatch pattern.

Usage: python scripts/chip_ld_bench.py [mode=infer|train|both]
                                       [batches=32,64,128] [train_batch=64]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    mode = kv.get("mode", "both")
    batches = [int(b) for b in kv.get("batches", "32,64,128").split(",")]
    train_batches = [int(b) for b in kv.get("train_batch", "64").split(",")]

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    import bench
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    if mode in ("infer", "both"):
        model = DetectionModel("yolov8-LD-P2.yaml", dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0))
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        print(f"LD-P2 params: {n_params/1e6:.3f}M", flush=True)
        for b in batches:
            t0 = time.perf_counter()
            try:
                v = bench.bench_batch_loop(model, variables, b)
                print(f"INFER b{b}: {v:.1f} img/s  (wall {time.perf_counter()-t0:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"INFER b{b}: FAILED {type(e).__name__}: {e}", flush=True)

    if mode in ("train", "both"):
        for tb in train_batches:
            t0 = time.perf_counter()
            try:
                tv = bench.bench_train_step("yolov8-LD-P2.yaml", batch=tb, loop=True)
                print(f"TRAIN b{tb}: {tv:.1f} img/s  (wall {time.perf_counter()-t0:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"TRAIN b{tb}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
