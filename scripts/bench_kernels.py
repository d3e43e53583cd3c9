"""Pallas-vs-XLA kernel benchmarks at production shapes on the real chip
(VERDICT r1 item 9: prove a win or document XLA-sufficiency).

Measures, with scan-chained device-true timing (same methodology as
bench.py):
- LDConv forward: XLA fused bilinear gather vs the Pallas kernel
- NMS suppression loop: XLA fori_loop on the (K,K) IoU matrix vs the
  Pallas VMEM kernel, at predictor (K=1024) shapes
- ScalSeq (SSFF fusion core): current XLA stack+dense+max composition

Writes docs/KERNELS.md with the table. Run: python scripts/bench_kernels.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, reps=3):
    """Device-true timing: iterations are scan-chained inside ONE jitted
    program with a serial data dependency (the relay backend has ~40 ms
    dispatch latency and a no-op block_until_ready — bench.py methodology),
    synced with a 1-element device_get."""

    @jax.jit
    def run(*a):
        def body(c, _):
            pert = jax.tree.map(lambda t: t + (c * 1e-30).astype(t.dtype), a[0])
            out = fn(pert, *a[1:])
            leaf = jax.tree.leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    _ = jax.device_get(run(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(run(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / iters * 1e3  # ms


def bench_ldconv():
    from experiment_yolo_tpu.nn.modules import LDConv

    rows = []
    for (b, h, w, c, outc, npar) in [(16, 80, 80, 64, 64, 4), (16, 40, 40, 128, 128, 4)]:
        mod = LDConv(outc, npar, dtype=jnp.bfloat16)
        x = jnp.zeros((b, h, w, c), jnp.bfloat16)
        v = mod.init(jax.random.PRNGKey(0), x, False)
        t_xla = timeit(lambda vv, xx: mod.apply(vv, xx, False), v, x)
        rows.append((f"LDConv {b}x{h}x{w}x{c}", t_xla, None))
        print(f"ldconv xla {b}x{h}x{w}x{c}: {t_xla:.3f} ms", file=sys.stderr)
    return rows


def bench_nms():
    from experiment_yolo_tpu.ops import non_max_suppression

    rows = []
    rng = np.random.RandomState(0)
    for (b, a, nc) in [(16, 8400, 80), (16, 33600, 6)]:
        boxes = jnp.asarray(rng.uniform(0, 640, (b, a, 4)).astype(np.float32))
        scores = jnp.asarray((rng.rand(b, a, nc) ** 4).astype(np.float32))
        t_xla = timeit(
            lambda bb, ss: non_max_suppression(bb, ss, conf_thres=0.25, use_pallas=False), boxes, scores
        )
        try:
            t_pl = timeit(
                lambda bb, ss: non_max_suppression(bb, ss, conf_thres=0.25, use_pallas=True), boxes, scores
            )
        except Exception as e:
            print(f"pallas nms failed: {type(e).__name__}: {e}", file=sys.stderr)
            t_pl = float("nan")
        rows.append((f"NMS B{b} A{a} nc{nc}", t_xla, t_pl))
        print(f"nms {b}x{a}x{nc}: xla {t_xla:.3f} ms, pallas {t_pl:.3f} ms", file=sys.stderr)
    return rows


def bench_scalseq():
    from experiment_yolo_tpu.nn.modules import ScalSeq

    rows = []
    b, c = 16, 128
    mod = ScalSeq(c, inc=(256, 512, 512), dtype=jnp.bfloat16)
    xs = [
        jnp.zeros((b, 80, 80, 256), jnp.bfloat16),
        jnp.zeros((b, 40, 40, 512), jnp.bfloat16),
        jnp.zeros((b, 20, 20, 512), jnp.bfloat16),
    ]
    v = mod.init(jax.random.PRNGKey(0), xs, False)
    t = timeit(lambda vv, *xx: mod.apply(vv, list(xx), False), v, *xs)
    rows.append((f"ScalSeq B{b} P3 80x80x{c}", t, None))
    print(f"scalseq: {t:.3f} ms", file=sys.stderr)
    return rows


def main():
    dev = jax.devices()[0]
    all_rows = []
    all_rows += bench_nms()
    all_rows += bench_ldconv()
    all_rows += bench_scalseq()
    lines = [
        "# Kernel benchmarks (Pallas vs XLA, real chip)",
        "",
        f"Device: {dev.device_kind}. Methodology: jitted, compile excluded,",
        "min over 3 reps of 20 chained iterations.",
        "",
        "| op @ shape | XLA ms | Pallas ms |",
        "|---|---|---|",
    ]
    for name, t_xla, t_pl in all_rows:
        lines.append(f"| {name} | {t_xla:.3f} | {'-' if t_pl is None else f'{t_pl:.3f}'} |")
    (REPO / "docs" / "KERNELS.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
