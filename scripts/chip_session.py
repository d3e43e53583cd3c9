"""One-process chip-measurement session for scripts/chip_queue.md.

Runs every queued A/B in a single process so the in-process compile cache
amortizes XLA compilation (2nd+ variant of a program ~40 s vs ~5-10 min
cold through the relay). Prints one JSON line per measurement and a final
summary dict; safe to re-run (each leg is independent and guarded).

Usage: python scripts/chip_session.py [--quick]
  --quick: only the re-baseline legs (infer b128 + train b128).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench.py: scan-chained protocols)


def main() -> None:
    quick = "--quick" in sys.argv
    if not bench.probe_backend(timeout_s=240, retries=1, wait_s=0):
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

    # ---- inference re-baseline + packed decode + b256 regression check ----
    m = DetectionModel("yolov8n.yaml", nc=80, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0))
    leg("infer_b128", lambda: bench.bench_batch(m, v, 128))
    if not quick:
        leg("infer_b256", lambda: bench.bench_batch(m, v, 256))
        mp = DetectionModel("yolov8n.yaml", nc=80, dtype=jnp.bfloat16, packed_decode=True)
        leg("infer_b128_packed", lambda: bench.bench_batch(mp, v, 128))

    # ---- train: baseline + packed decode forms + batch scaling ----
    leg("train_b128", lambda: bench.bench_train_step("yolov8-ASF-P2P2.yaml", batch=128))
    if quick:
        print(json.dumps(out))
        return
    leg("train_b128_packed_xla",
        lambda: bench.bench_train_step("yolov8-ASF-P2P2.yaml", batch=128, packed_decode="xla"))
    leg("train_b128_packed_pallas",
        lambda: bench.bench_train_step("yolov8-ASF-P2P2.yaml", batch=128, packed_decode="pallas"))
    # b192/b256 now that hat-DFL freed the one-hot broadcasts; selective
    # remat (min-H*W int) if activations don't fit
    leg("train_b192", lambda: bench.bench_train_step("yolov8-ASF-P2P2.yaml", batch=192))
    leg("train_b256_remat160",
        lambda: bench.bench_train_step("yolov8-ASF-P2P2.yaml", batch=256, remat=160 * 160))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
