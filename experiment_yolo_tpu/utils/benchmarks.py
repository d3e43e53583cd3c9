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


def benchmark_formats(
    model,
    variables,
    imgsz: int = 320,
    iters: int = 10,
    formats=("stablehlo", "saved_model", "tflite", "onnx", "pb", "tfjs", "edgetpu"),
    export_dir=None,
) -> list:
    """All-format benchmark table (reference utils/benchmarks.py:benchmark):
    export the model to every format, run each artifact through AutoBackend,
    and report status / size on disk / latency. The native jitted path is
    row 0 as the baseline. Returns a list of row dicts; failures are caught
    per-format so one missing runtime never kills the table."""
    import tempfile
    from pathlib import Path

    import numpy as np

    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.autobackend import AutoBackend

    export_dir = Path(export_dir or tempfile.mkdtemp(prefix="bench_formats_"))
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, imgsz, imgsz, 3), np.uint8)

    rows = []

    def time_host(fn):
        fn(img)  # warmup / compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(img)
        dt = (time.perf_counter() - t0) / iters * 1000
        return dt, out

    # row 0: native jitted forward (the deployment baseline)
    native = jax.jit(lambda v, x: model.predict(v, x.astype(jnp.float32) / 255.0))
    ms, ref_out = time_host(lambda a: jax.block_until_ready(native(variables, jnp.asarray(a))))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    rows.append({"format": "jax (jit)", "status": "ok",
                 "size_mb": round(n_params * 4 / 1e6, 1), "ms_per_image": round(ms, 2)})

    ex = Exporter(model, variables, imgsz=imgsz, batch=1)
    for fmt in formats:
        row = {"format": fmt, "status": "ok", "size_mb": None, "ms_per_image": None}
        try:
            p = ex(fmt, export_dir / f"model_{fmt}")
            p = Path(p)
            size = (sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
                    if p.is_dir() else p.stat().st_size)
            row["size_mb"] = round(size / 1e6, 1)
            backend = AutoBackend(str(p))
            ms, out = time_host(backend.forward)
            row["ms_per_image"] = round(ms, 2)
            # output sanity vs the native path (loose: artifact dtypes vary)
            np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref_out[0]),
                                       atol=2.0, rtol=0.2)
        except Exception as e:  # noqa: BLE001 — reference benchmark() also row-gates
            row["status"] = f"fail: {type(e).__name__}: {e}"
        rows.append(row)

    w = max(len(r["format"]) for r in rows) + 2
    LOGGER.info(f"{'format':<{w}}{'status':<8}{'size MB':>9}{'ms/img':>9}")
    for r in rows:
        LOGGER.info(f"{r['format']:<{w}}{str(r['status'])[:40]:<8}"
                    f"{str(r['size_mb']):>9}{str(r['ms_per_image']):>9}")
    return rows
