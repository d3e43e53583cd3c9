"""FPS benchmark — TPU counterpart of the reference's get_FPS.py.

Measures 640x640 YOLOv8-N inference throughput (forward + DFL decode, the
same scope as the reference's fused-model ``model(x)`` timing at
get_FPS.py:62-88: NMS excluded) in bf16 on one chip, sweeping batch size.

Methodology: the remote-relay TPU backend has ~40 ms per-dispatch
round-trip latency and a no-op ``block_until_ready``, so N iterations are
chained INSIDE one jitted program via ``lax.scan`` with a serial
dependency (the carry perturbs the input by a denormal-scale amount) so
XLA cannot hoist the loop-invariant forward out of the loop; timing syncs
with a 1-element ``device_get``. This measures pure device throughput —
the analogue of get_FPS.py's warmup + 1000 timed iters with
``torch.cuda.synchronize``.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 3000 img/s (the BASELINE.json target for a v5e
chip; the reference publishes no throughput numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

WARMUP_ITERS = 5
ITERS = 50
BASELINE_IMG_S = 3000.0


def make_timed_fn(model, iters: int):
    @jax.jit
    def run(variables, x):
        def body(carry, _):
            # serial dependency: input depends on previous output so the
            # loop body cannot be hoisted or collapsed by XLA
            xi = x + carry * 1e-30
            boxes, scores = model.predict(variables, xi)
            return jnp.sum(scores[0, 0]) + jnp.sum(boxes[0, 0]), None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    return run


def bench_batch(model, variables, batch: int, imgsz: int = 640) -> float:
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    warm = make_timed_fn(model, WARMUP_ITERS)
    _ = jax.device_get(warm(variables, x))
    run = make_timed_fn(model, ITERS)
    _ = jax.device_get(run(variables, x))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(run(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch * ITERS / dt


def main() -> None:
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    # secondary diagnostic: the DEAL-YOLO flagship's throughput (P2 head,
    # 34k anchors) at its best batch — stderr only, headline stays yolov8n
    try:
        deal = DetectionModel("yolov8-ASF-P2P2.yaml", dtype=jnp.bfloat16)
        dv = deal.init(jax.random.PRNGKey(0))
        v = bench_batch(deal, dv, 128)
        print(f"deal-yolo ASF-P2P2 batch 128: {v:.1f} img/s", file=sys.stderr)
    except Exception as e:
        print(f"deal bench skipped: {type(e).__name__}", file=sys.stderr)

    model = DetectionModel("yolov8n.yaml", nc=80, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))

    # batch 128 is the sweet spot on v5e: XLA lays out the small-channel
    # early tensors with batch as the 128-lane dim, eliminating padding
    # waste (measured superlinear speedup from 32 -> 128).
    best = 0.0
    best_b = 0
    for b in (32, 64, 128, 256):
        v = None
        for attempt in range(3):  # the relay backend occasionally hiccups
            try:
                v = bench_batch(model, variables, b)
                break
            except Exception as e:
                print(f"batch {b} attempt {attempt}: {type(e).__name__}: {e}", file=sys.stderr)
                time.sleep(2)
        if v is None:
            continue
        print(f"batch {b}: {v:.1f} img/s", file=sys.stderr)
        if v > best:
            best, best_b = v, b
    print(
        json.dumps(
            {
                "metric": f"yolov8n_640_bf16_infer_img_s_per_chip(batch={best_b})",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
