"""Chip-measurement session for DEAL-YOLO-LD (yolov8-LD-P2) — round 4.

The paper's headline 0.914M model (reference README.md:61,63; LDConv at
reference ultralytics/nn/modules/conv.py:350-480) had no measured chip
throughput through round 3. One process so the compile cache amortizes the
relay's cold-compile cost; one JSON line per leg plus a final summary.

Usage: python scripts/chip_session_ld.py [--quick]
  --quick: infer b64 + train b32 only.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main() -> None:
    quick = "--quick" in sys.argv
    if not bench.probe_backend(timeout_s=240, retries=2, wait_s=60):
        print(json.dumps({"error": "tpu backend unreachable"}))
        return

    import jax
    import jax.numpy as jnp

    from experiment_yolo_tpu.nn.tasks import DetectionModel

    out = {}

    def leg(name, fn):
        try:
            t0 = time.time()
            v = fn()
            out[name] = round(v, 1)
            print(json.dumps({"leg": name, "img_s": round(v, 1),
                              "wall_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as e:
            out[name] = f"{type(e).__name__}: {e}"
            print(json.dumps({"leg": name, "error": out[name]}), flush=True)

    m = DetectionModel("yolov8-LD-P2.yaml", dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    print(json.dumps({"model": "yolov8-LD-P2", "params": n_params}), flush=True)

    # ---- inference sweep (the ASF sweet spot was b128; LD's gather may
    # shift it — the (B,h,w,N,C) sampled tensor scales with B) ----
    if quick:
        leg("ld_infer_b64", lambda: bench.bench_batch(m, v, 64))
    else:
        for b in (32, 64, 128):
            leg(f"ld_infer_b{b}", lambda b=b: bench.bench_batch(m, v, b))
        fl = bench.forward_flops(m, v, 64)
        if fl:
            out["ld_gflop_per_img"] = round(fl / 64 / 1e9, 2)
            print(json.dumps({"leg": "flops", "gflop_per_img": out["ld_gflop_per_img"]}),
                  flush=True)

    # ---- train step sweep (remat'd gather; b128 may still OOM) ----
    if quick:
        leg("ld_train_b32", lambda: bench.bench_train_step("yolov8-LD-P2.yaml", batch=32))
    else:
        for b in (32, 64, 128):
            leg(f"ld_train_b{b}",
                lambda b=b: bench.bench_train_step("yolov8-LD-P2.yaml", batch=b))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
