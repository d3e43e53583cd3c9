"""Decompose DEAL ASF-P2P2 train-step time on the real chip (VERDICT r3 item 3).

Times, separately jitted and scan-chained (hoist-proof):
  fwd        : train-mode forward only
  fwd+loss   : forward + TAL + detection loss
  grad       : value_and_grad of the above
  full       : the production train step (grad + SGD + EMA)
Also reports XLA FLOPs for each program and implied MFU, across batch sizes.

Usage: python scripts/profile_train.py [cfg=yolov8-ASF-P2P2.yaml] [batches=32,64]
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

PEAK_BF16 = 197e12  # TPU v5e


def timed(fn, *args, iters=5, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def flops_of(jfn, *args):
    try:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def main(argv):
    kv = dict(a.partition("=")[::2] for a in argv)
    cfg = kv.get("cfg", "yolov8-ASF-P2P2.yaml")
    batches = [int(b) for b in kv.get("batches", "32,64").split(",")]
    imgsz = int(kv.get("imgsz", 640))

    from experiment_yolo_tpu.engine.trainer import DetectionTrainer, TrainState
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.optim.builders import build_optimizer
    from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss

    model = DetectionModel(cfg)
    variables = model.init(jax.random.PRNGKey(0))
    loss_cfg = LossConfig(nc=model.nc)
    strides = model.strides
    dtype = jnp.bfloat16

    for batch in batches:
        rng = np.random.RandomState(0)
        nl = 16
        imgs_u8 = jnp.asarray(rng.randint(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
        tb = {
            "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (batch, nl, 4)).astype(np.float32)),
            "cls": jnp.asarray(rng.randint(0, model.nc, (batch, nl)), jnp.int32),
            "mask": jnp.asarray(np.tile(np.arange(nl) < 6, (batch, 1))),
        }

        iters = 5

        def chain(body):
            """scan-chain `body(carry)->carry` iters times, jitted."""
            @jax.jit
            def run(c):
                c, _ = jax.lax.scan(lambda cc, _: (body(cc), None), c, None, length=iters)
                return jax.tree.map(lambda l: jnp.sum(l[0]) if hasattr(l, "ndim") and l.ndim else l,
                                    (jax.tree.leaves(c)[0],))
            return run

        params, stats = variables["params"], variables["batch_stats"]

        # --- fwd only ---
        def fwd_body(x):
            out, _ = model.module.apply({"params": params, "batch_stats": stats},
                                        x, True, mutable=["batch_stats"])
            # fold a data dependency into the carry so scan can't elide the fwd
            return x + out[0].mean().astype(x.dtype) * 1e-9

        x0 = imgs_u8.astype(dtype) / 255.0
        run_fwd = chain(fwd_body)
        t_fwd = timed(run_fwd, x0, iters=iters)

        # --- fwd + loss ---
        def loss_of(params, x):
            out, upd = model.module.apply({"params": params, "batch_stats": stats},
                                          x, True, mutable=["batch_stats"])
            feats = [f.astype(jnp.float32) for f in out]
            total, comps, new_iou = detection_loss(feats, tb, strides, loss_cfg, jnp.asarray(1.0))
            return total

        def fl_body(x):
            return x + loss_of(params, x).astype(x.dtype) * 1e-9

        run_fl = chain(fl_body)
        t_fl = timed(run_fl, x0, iters=iters)

        # --- grad ---
        def grad_body(carry):
            p, x = carry
            g = jax.grad(loss_of)(p, x)
            p2 = jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)
            return (p2, x)

        @jax.jit
        def run_grad(p, x):
            (p, x), _ = jax.lax.scan(lambda c, _: (grad_body(c), None), (p, x), None, length=iters)
            return jnp.sum(jax.tree.leaves(p)[0])

        t_grad = timed(run_grad, params, x0, iters=iters)

        # --- full production step ---
        trainer = DetectionTrainer(model=model, variables=variables,
                                   overrides={"amp": True, "batch": batch, "imgsz": imgsz})
        trainer.loss_cfg = loss_cfg
        trainer.tx = build_optimizer(
            variables["params"], "SGD", 0.01, 0.937, 5e-4, nb=100, epochs=100, lrf=0.01,
            cos_lr=False, warmup_epochs=3.0, warmup_bias_lr=0.1, warmup_momentum=0.8,
        )
        state = TrainState(
            params=params, batch_stats=stats,
            opt_state=trainer.tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            ema_batch_stats=jax.tree.map(jnp.copy, stats),
            iou_mean=jnp.asarray(1.0, jnp.float32),
            step=jnp.zeros([], jnp.int32),
            ema_updates=jnp.zeros([], jnp.int32),
        )
        step = trainer._make_train_step()
        batch_full = {"img": imgs_u8, **tb}

        @jax.jit
        def run_full(s, b):
            def body(ss, _):
                s2, _ = step(ss, b)
                return s2, None
            s, _ = jax.lax.scan(body, s, None, length=iters)
            return jnp.sum(jax.tree.leaves(s.params)[0]).astype(jnp.float32) + s.step

        t_full = timed(run_full, state, batch_full, iters=iters)

        f_grad = flops_of(run_grad, params, x0) / iters
        f_full = flops_of(run_full, state, batch_full) / iters
        print(f"\n== {cfg} batch={batch} imgsz={imgsz} ==")
        print(f"fwd      : {t_fwd*1e3:8.2f} ms  {batch/t_fwd:8.1f} img/s")
        print(f"fwd+loss : {t_fl*1e3:8.2f} ms  {batch/t_fl:8.1f} img/s   (loss adds {(t_fl-t_fwd)*1e3:.2f} ms)")
        print(f"grad     : {t_grad*1e3:8.2f} ms  {batch/t_grad:8.1f} img/s   (bwd adds {(t_grad-t_fl)*1e3:.2f} ms)")
        print(f"full step: {t_full*1e3:8.2f} ms  {batch/t_full:8.1f} img/s   (opt+EMA adds {(t_full-t_grad)*1e3:.2f} ms)")
        if f_full:
            print(f"flops/step grad={f_grad/1e9:.1f}G full={f_full/1e9:.1f}G  "
                  f"MFU(full)={f_full/t_full/PEAK_BF16*100:.1f}%")


if __name__ == "__main__":
    main(sys.argv[1:])
