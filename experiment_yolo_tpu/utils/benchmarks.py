"""Model benchmarking: latency/FPS harness.

Rebuild of the reference's ``get_FPS.py`` (warmup + timed iters with
explicit sync) and ``utils/benchmarks.py:benchmark()``. The relay TPU
backend's ``block_until_ready`` is a no-op, so timed iterations are
chained inside one XLA program with a serial data dependency and synced
with a tiny ``device_get`` (see bench.py docstring).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.utils import LOGGER


def benchmark_model(
    model,
    variables,
    imgsz: int = 640,
    batch: int = 8,
    warmup: int = 5,
    iters: int = 50,
    repeats: int = 3,
    **_,
) -> Dict[str, float]:
    """Forward+decode throughput/latency for one (batch, imgsz) point."""

    def make(n):
        @jax.jit
        def run(variables, x):
            def body(carry, _):
                xi = x + carry * 1e-30
                boxes, scores = model.predict(variables, xi)
                return jnp.sum(scores[0, 0]) + jnp.sum(boxes[0, 0]), None

            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return s

        return run

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    _ = jax.device_get(make(warmup)(variables, x))
    run = make(iters)
    _ = jax.device_get(run(variables, x))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = jax.device_get(run(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    latency_ms = dt / iters * 1000
    fps = batch * iters / dt
    out = {
        "imgsz": imgsz,
        "batch": batch,
        "latency_ms_per_batch": round(latency_ms, 3),
        "latency_ms_per_image": round(latency_ms / batch, 3),
        "img_per_s": round(fps, 1),
    }
    LOGGER.info(
        f"benchmark: imgsz={imgsz} batch={batch}  {latency_ms:.2f} ms/batch  "
        f"{latency_ms / batch:.2f} ms/img  {fps:.1f} img/s"
    )
    return out
