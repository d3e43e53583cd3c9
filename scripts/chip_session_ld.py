"""Chip-measurement session for DEAL-YOLO-LD (yolov8-LD-P2) — round 4.

The paper's headline 0.914M model (reference README.md:61,63; LDConv at
reference ultralytics/nn/modules/conv.py:350-480) had no measured chip
throughput through round 3. One process so the compile cache amortizes the
relay's cold-compile cost; one JSON line per leg plus a final summary, and
every leg's result is flushed to --out (default /tmp/ld_session.json) so a
backend crash mid-session cannot eat earlier measurements. The risky
big-batch legs run LAST for the same reason, with a backend re-probe
between legs.

Usage: python scripts/chip_session_ld.py [--quick] [--out PATH]
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
    out_path = "/tmp/ld_session.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if not bench.probe_backend(timeout_s=240, retries=2, wait_s=60):
        print(json.dumps({"error": "tpu backend unreachable"}))
        return

    import jax
    import jax.numpy as jnp

    from experiment_yolo_tpu.nn.tasks import DetectionModel

    out = {}

    def flush():
        Path(out_path).write_text(json.dumps(out, indent=1))

    def leg(name, fn):
        try:
            t0 = time.time()
            v = fn()
            out[name] = round(v, 1)
            print(json.dumps({"leg": name, "img_s": round(v, 1),
                              "wall_s": round(time.time() - t0, 1)}), flush=True)
            flush()
            return True
        except Exception as e:
            out[name] = f"{type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({"leg": name, "error": out[name]}), flush=True)
            flush()
            # a worker crash poisons the client; give the relay time to heal
            # and confirm it's back before the next leg
            time.sleep(30)
            if not bench.probe_backend(timeout_s=240, retries=3, wait_s=60):
                out["aborted"] = f"backend unreachable after {name}"
                print(json.dumps({"abort": out["aborted"]}), flush=True)
                flush()
                sys.exit(1)
            return False

    m = DetectionModel("yolov8-LD-P2.yaml", dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    out["params"] = n_params
    print(json.dumps({"model": "yolov8-LD-P2", "params": n_params}), flush=True)

    # LDConv's internal lax.scan faults the TPU worker when nested inside the
    # outer timing scan (round-4 chip finding; the plain jitted predict runs
    # fine), so every LD leg uses the scan-free loop-mode bench.
    if quick:
        leg("ld_infer_b64", lambda: bench.bench_batch_loop(m, v, 64))
        leg("ld_train_b32", lambda: bench.bench_train_step("yolov8-LD-P2.yaml", batch=32, loop=True))
        print(json.dumps(out), flush=True)
        return

    # canary first (small batch: a crash here means the program itself faults,
    # not memory pressure), then safe legs, big-batch legs last (a b128 fault
    # must not cost the session the numbers it already has)
    leg("ld_infer_b8", lambda: bench.bench_batch_loop(m, v, 8))
    for b in (32, 64):
        leg(f"ld_infer_b{b}", lambda b=b: bench.bench_batch_loop(m, v, b))
    try:
        fl = bench.forward_flops(m, v, 32)
    except Exception as e:
        fl = None
        print(json.dumps({"leg": "flops", "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)
    if fl:
        out["ld_gflop_per_img"] = round(fl / 32 / 1e9, 2)
        print(json.dumps({"leg": "flops", "gflop_per_img": out["ld_gflop_per_img"]}),
              flush=True)
        flush()
    for b in (32, 64):
        leg(f"ld_train_b{b}",
            lambda b=b: bench.bench_train_step("yolov8-LD-P2.yaml", batch=b, loop=True))
    leg("ld_infer_b128", lambda: bench.bench_batch_loop(m, v, 128))
    leg("ld_train_b128", lambda: bench.bench_train_step("yolov8-LD-P2.yaml", batch=128, loop=True))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
