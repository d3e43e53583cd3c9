"""Chip session 2: fused-DFL custom-VJP A/B + batch scaling it unlocks.

The fused decode/loss VJPs drop ~2.2 GB of (B, A, 4, reg_max) residuals at
b128 (exp bf16 + exp f32 + hat) — b192 previously OOM'd by only 485 MB, so
re-try the larger batches without remat. One process so the compile cache
amortizes. Prints one JSON line per leg.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main() -> None:
    if not bench.probe_backend(timeout_s=240, retries=1, wait_s=0):
        print(json.dumps({"error": "tpu backend unreachable"}))
        return

    out = {}

    def leg(name, fn):
        try:
            t0 = time.time()
            v = fn()
            out[name] = round(v, 1)
            print(json.dumps({"leg": name, "img_s": round(v, 1),
                              "wall_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as e:
            out[name] = f"{type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({"leg": name, "error": out[name]}), flush=True)

    CFG = "yolov8-ASF-P2P2.yaml"
    leg("train_b128_fused", lambda: bench.bench_train_step(CFG, batch=128))
    leg("train_b128_unfused", lambda: bench.bench_train_step(CFG, batch=128, fused_dfl=False))
    leg("train_b192_fused", lambda: bench.bench_train_step(CFG, batch=192))
    leg("train_b256_fused", lambda: bench.bench_train_step(CFG, batch=256))
    if isinstance(out.get("train_b256_fused"), str):  # OOM -> light remat
        leg("train_b256_fused_remat320",
            lambda: bench.bench_train_step(CFG, batch=256, remat=320 * 320))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
