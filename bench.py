"""FPS benchmark — TPU counterpart of the reference's get_FPS.py.

Measures 640x640 YOLOv8-N inference throughput (forward + DFL decode, the
same scope as the reference's fused-model ``model(x)`` timing at
get_FPS.py:62-88: NMS excluded) in bf16 on one chip, sweeping batch size.

Methodology: the remote-relay TPU backend has ~40 ms per-dispatch
round-trip latency and a no-op ``block_until_ready``, so N iterations are
chained INSIDE one jitted program via ``lax.scan`` with a serial
dependency: the carry perturbs every float parameter by a denormal-scale
amount, so no part of the forward is loop-invariant and XLA can neither
hoist nor collapse the body — while the INPUT tensor stays loop-invariant
and its bf16 convert + layout copy hoist out (the reference's get_FPS also
times a pre-staged device tensor). Throughput is the 50-vs-5-iteration
time delta, which cancels the shared dispatch latency and one-time input
prep. This measures pure steady-state device throughput — the analogue of
get_FPS.py's warmup + 1000 timed iters with ``torch.cuda.synchronize``.

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


def _perturb_one_leaf(variables, eps):
    """Add ``eps`` to EVERY float leaf (params and stats): every layer's
    output then depends on the scan carry, so XLA can neither hoist any op
    out of the loop nor collapse the iterations. The cost is one sweep over
    the parameters (a few MB — noise next to the GB-scale activations).
    Perturbing a single leaf instead would let XLA hoist everything upstream
    of that leaf's layer, silently inflating the measurement for configs
    whose flatten order does not start at the stem."""
    return jax.tree.map(
        lambda l: l + eps.astype(l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l,
        variables,
    )


def make_timed_fn(model, iters: int):
    @jax.jit
    def run(variables, x):
        # The carry perturbs a PARAMETER, not the input: the forward still
        # has a serial cross-iteration dependency (no hoist/collapse), but
        # the input tensor stays loop-invariant so its bf16 convert + layout
        # copy hoist OUT of the loop — same scope as the reference's
        # get_FPS.py:62-88, which times a pre-staged device tensor
        # (profile_hlo measured the per-iter input convert+copy at ~18% of
        # the step when the input carried the perturbation).
        def body(carry, _):
            v = _perturb_one_leaf(variables, carry * 1e-30)
            boxes, scores = model.predict(v, x)
            return jnp.sum(scores[0, 0]) + jnp.sum(boxes[0, 0]), None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    return run


def bench_batch(model, variables, batch: int, imgsz: int = 640) -> float:
    """Per-iteration throughput via the two-length delta: time the 5-iter and
    50-iter scan programs and divide by the 45-iter difference. Both programs
    share the per-call relay dispatch (~40 ms) and the hoisted one-time input
    prep, so the delta is pure steady-state device time — the analogue of the
    reference's cuda.synchronize-bracketed timed loop (get_FPS.py:62-88)."""
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    warm = make_timed_fn(model, WARMUP_ITERS)
    run = make_timed_fn(model, ITERS)
    _ = jax.device_get(warm(variables, x))  # compile
    _ = jax.device_get(run(variables, x))  # compile
    t_warm, t_run = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(warm(variables, x))
        t_warm.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = jax.device_get(run(variables, x))
        t_run.append(time.perf_counter() - t0)
    dt = min(t_run) - min(t_warm)
    # dispatch jitter (~40 ms/call) can make the delta collapse when the
    # device time itself is small; fall back to the conservative whole-call
    # time rather than publishing a division by ~0
    floor = min(t_run) * (ITERS - WARMUP_ITERS) / ITERS * 0.2
    if dt <= floor:
        print(f"bench: delta {dt * 1e3:.1f} ms below noise floor; "
              "falling back to whole-call timing", file=sys.stderr)
        return batch * ITERS / min(t_run)
    return batch * (ITERS - WARMUP_ITERS) / dt


def bench_batch_loop(model, variables, batch: int, imgsz: int = 640) -> float:
    """Scan-free throughput for models whose forward already contains a
    ``lax.scan`` (LDConv row-chunking): wrapping such a body in the outer
    timing scan faults the TPU worker (chip-observed, round 4 — the nested
    scan+remat program kills the worker process while the plain jitted
    predict, i.e. the PRODUCTION path, runs fine). Iterations are instead
    chained by a scalar carry ACROSS jit calls — K async dispatches of one
    compiled program, blocked once at the end. The 50-vs-5 call delta
    cancels fixed per-call cost the same way as bench_batch; async enqueue
    pipelines the relay dispatch with device compute."""
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)

    # Chain the carry through the INPUT, not the params: the param-perturbed
    # LD program hangs the TPU worker at compile (chip-observed round 4; the
    # unperturbed program compiles in 14 s). Across separate dispatches
    # nothing can hoist or fold anyway — the carry only guarantees a serial
    # data dependency between calls; the cost is the input add + convert
    # staying inside the timed region (small vs the model at these batches).
    @jax.jit
    def one(carry, variables, x):
        boxes, scores = model.predict(variables, x + carry * 1e-30)
        return jnp.sum(scores[0, 0]) + jnp.sum(boxes[0, 0])

    def run(k):
        c = jnp.float32(0.0)
        for _ in range(k):
            c = one(c, variables, x)
        return jax.device_get(c)

    run(WARMUP_ITERS)  # compile + warm
    t_warm, t_run = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        run(WARMUP_ITERS)
        t_warm.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(ITERS)
        t_run.append(time.perf_counter() - t0)
    dt = min(t_run) - min(t_warm)
    floor = min(t_run) * (ITERS - WARMUP_ITERS) / ITERS * 0.2
    if dt <= floor:
        print(f"bench: loop delta {dt * 1e3:.1f} ms below noise floor; "
              "falling back to whole-call timing", file=sys.stderr)
        return batch * ITERS / min(t_run)
    return batch * (ITERS - WARMUP_ITERS) / dt


def bench_train_step(cfg: str = "yolov8-ASF-P2P2.yaml", batch: int = 32, imgsz: int = 640,
                     loop: bool = False, **overrides) -> float:
    """Full train-step throughput (forward + TAL + loss + backward + SGD/EMA
    update) on the DEAL flagship — counterpart of the reference's per-epoch
    it/s under train.py. Iterations are scan-chained via the TrainState carry
    so XLA cannot elide the update chain. ``loop=True`` chains the jitted
    step across Python calls instead (donated state carry, async dispatch,
    delta timing) — required for LDConv configs, whose internal lax.scan
    faults the TPU worker when nested inside the outer timing scan; this is
    also exactly the production trainer dispatch pattern."""
    import numpy as np

    from experiment_yolo_tpu.engine.trainer import DetectionTrainer, TrainState
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.optim.builders import build_optimizer

    model = DetectionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = DetectionTrainer(model=model, variables=variables,
                               overrides={"amp": True, "batch": batch, "imgsz": imgsz, **overrides})
    # trainer.__init__ already built loss_cfg from the overrides (incl. the
    # remat -> checkpoint_loss coupling); no need to rebuild it here
    trainer.tx = build_optimizer(
        variables["params"], "SGD", 0.01, 0.937, 5e-4, nb=100, epochs=100, lrf=0.01,
        cos_lr=False, warmup_epochs=3.0, warmup_bias_lr=0.1, warmup_momentum=0.8,
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=trainer.tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        iou_mean=jnp.asarray(1.0, jnp.float32),
        step=jnp.zeros([], jnp.int32),
        ema_updates=jnp.zeros([], jnp.int32),
    )
    rng = np.random.RandomState(0)
    nl = 16
    batch_np = {
        "img": jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)),
        "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (batch, nl, 4)).astype(np.float32)),
        "cls": jnp.asarray(rng.randint(0, model.nc, (batch, nl)), jnp.int32),
        "mask": jnp.asarray(np.tile(np.arange(nl) < 6, (batch, 1))),
    }
    step = trainer._make_train_step()
    iters = 10

    if loop:
        def run_k(state, k):
            comps = None
            for _ in range(k):
                state, comps = step(state, batch_np)
            jax.block_until_ready(comps)
            return state

        state = run_k(state, 2)  # compile + warm
        t_short, t_long = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            state = run_k(state, 2)
            t_short.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            state = run_k(state, iters + 2)
            t_long.append(time.perf_counter() - t0)
        dt = min(t_long) - min(t_short)
        if dt <= 0:
            return batch * (iters + 2) / min(t_long)
        return batch * iters / dt

    @jax.jit
    def run(state, b):
        def body(s, _):
            s2, _comps = step(s, b)
            return s2, None

        s, _ = jax.lax.scan(body, state, None, length=iters)
        # reduce over an actual updated parameter so XLA cannot dead-code
        # eliminate the grad/update chain (returning only s.step would)
        return jnp.sum(jax.tree.leaves(s.params)[0]).astype(jnp.float32) + s.step

    _ = jax.device_get(run(state, batch_np))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(run(state, batch_np))
        times.append(time.perf_counter() - t0)
    return batch * iters / min(times)


def forward_flops(model, variables, batch: int, imgsz: int = 640) -> float:
    """XLA's own FLOP count for the jitted forward+decode program."""
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    fn = jax.jit(lambda v, xx: model.predict(v, xx))
    try:
        cost = fn.lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def probe_backend(timeout_s: int = 240, retries: int = 3, wait_s: int = 120) -> bool:
    """Bounded backend-reachability probe.

    The remote-relay TPU backend HANGS (not errors) at init when the relay
    is down, which would wedge this script indefinitely. Probe device init
    in a subprocess with a hard timeout, retrying a few times, so bench
    always terminates with either real numbers or an explicit error line.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True  # local smoke runs
    for i in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
            print(f"tpu probe {i}: init failed: {r.stderr.decode()[-200:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"tpu probe {i}: init hung > {timeout_s}s (relay down?)", file=sys.stderr)
        if i < retries - 1:
            time.sleep(wait_s)
    return False


def main() -> None:
    if not probe_backend():
        print(json.dumps({
            "metric": "yolov8n_640_bf16_infer_img_s_per_chip",
            "value": 0.0,
            "unit": "img/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unreachable (relay outage); last measured numbers in BENCH_r02.json / docs/KERNELS.md",
        }))
        return

    from experiment_yolo_tpu.nn.tasks import DetectionModel

    extras = {}
    # secondary metrics: the DEAL-YOLO flagship's inference AND full
    # train-step throughput (P2 head, 34k anchors) — headline stays yolov8n
    try:
        deal = DetectionModel("yolov8-ASF-P2P2.yaml", dtype=jnp.bfloat16)
        dv = deal.init(jax.random.PRNGKey(0))
        v = bench_batch(deal, dv, 128)
        extras["deal_asf_p2p2_infer_img_s"] = round(v, 1)
        print(f"deal-yolo ASF-P2P2 infer batch 128: {v:.1f} img/s", file=sys.stderr)
    except Exception as e:
        print(f"deal infer bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        # batch 128 is the measured train sweet spot (XLA's batch-minor
        # conv-grad layouts fill all 128 lanes; fits HBM since the hat-DFL
        # rewrite freed the one-hot broadcasts) — docs/KERNELS.md round-3
        tv = bench_train_step("yolov8-ASF-P2P2.yaml", batch=128)
        extras["deal_asf_p2p2_train_img_s"] = round(tv, 1)
        extras["deal_asf_p2p2_train_batch"] = 128
        print(f"deal-yolo ASF-P2P2 train batch 128: {tv:.1f} img/s", file=sys.stderr)
    except Exception as e:
        print(f"deal train bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    # packed-decode A/B retired: measured on-chip 2026-08-18 (docs/KERNELS.md)
    # — packed_xla train 501.8 vs 672.5 img/s, packed inference 6456 vs 9099;
    # the packed forms lose and stay gated off by default.

    # the paper's OTHER flagship: DEAL-YOLO-LD (LDConv everywhere). Loop-mode
    # timing throughout: LDConv's internal row-chunk lax.scan faults the TPU
    # worker when nested inside the outer timing scan (round 4, chip), and
    # the jit-call chain is the production dispatch pattern anyway.
    try:
        ld = DetectionModel("yolov8-LD-P2.yaml", dtype=jnp.bfloat16)
        lv = ld.init(jax.random.PRNGKey(0))
        v = bench_batch_loop(ld, lv, 64)
        extras["deal_ld_p2_infer_img_s"] = round(v, 1)
        print(f"deal-yolo LD-P2 infer batch 64: {v:.1f} img/s", file=sys.stderr)
    except Exception as e:
        print(f"LD infer bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    try:
        tv = bench_train_step("yolov8-LD-P2.yaml", batch=32, loop=True)
        extras["deal_ld_p2_train_img_s"] = round(tv, 1)
        extras["deal_ld_p2_train_batch"] = 32
        print(f"deal-yolo LD-P2 train batch 32: {tv:.1f} img/s", file=sys.stderr)
    except Exception as e:
        print(f"LD train bench skipped: {type(e).__name__}: {e}", file=sys.stderr)

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
    fl = forward_flops(model, variables, best_b)
    if fl and best_b:
        tflops = best * (fl / best_b) / 1e12  # achieved TFLOP/s
        extras["yolov8n_gflop_per_img"] = round(fl / best_b / 1e9, 2)
        extras["yolov8n_achieved_tflop_s"] = round(tflops, 1)
        extras["yolov8n_mfu_vs_197tflops"] = round(tflops / 197.0, 3)
        print(f"mfu: {tflops:.1f} TFLOP/s achieved ({tflops / 197.0:.1%} of 197)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"yolov8n_640_bf16_infer_img_s_per_chip(batch={best_b})",
                "value": round(best, 1),
                "unit": "img/s",
                "vs_baseline": round(best / BASELINE_IMG_S, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
