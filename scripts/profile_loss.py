"""Micro-profile of the detection loss + TAL at DEAL ASF-P2P2 shapes.

Times each stage on the real chip, fwd and fwd+bwd:
  tal      : tal.assign alone
  loss     : detection_loss on raw feature maps
  loss_bwd : grad(detection_loss) wrt feats
plus ablations (cls-only / box+dfl-only) to localize cost.

Usage: python scripts/profile_loss.py [batch=32]
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

from experiment_yolo_tpu.utils import tal
from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv):
    kv = dict(a.partition("=")[::2] for a in argv)
    b = int(kv.get("batch", 32))
    nc, reg_max, m = 6, 16, 16
    strides = (4, 8, 16)
    imgsz = 640
    shapes = [(imgsz // s, imgsz // s) for s in strides]
    a_total = sum(h * w for h, w in shapes)
    no = nc + 4 * reg_max
    rng = np.random.RandomState(0)

    feats = [jnp.asarray(rng.randn(b, h, w, no).astype(np.float32)) for h, w in shapes]
    batch = {
        "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (b, m, 4)).astype(np.float32)),
        "cls": jnp.asarray(rng.randint(0, nc, (b, m)), jnp.int32),
        "mask": jnp.asarray(np.tile(np.arange(m) < 6, (b, 1))),
    }
    cfg = LossConfig(nc=nc)

    # --- TAL alone ---
    pd_scores = jnp.asarray(rng.rand(b, a_total, nc).astype(np.float32))
    pd_bboxes = jnp.asarray((rng.rand(b, a_total, 4) * 100).astype(np.float32))
    pd_bboxes = pd_bboxes.at[..., 2:].add(pd_bboxes[..., :2])
    anc = jnp.asarray(rng.rand(a_total, 2).astype(np.float32) * 640)
    gtb = jnp.asarray((rng.rand(b, m, 4) * 300).astype(np.float32))
    gtb = gtb.at[..., 2:].add(gtb[..., :2])

    t_tal = timed(lambda: tal.assign(pd_scores, pd_bboxes, anc, batch["cls"], gtb,
                                     batch["mask"], topk=10, num_classes=nc))
    t_tal_exact = timed(lambda: tal.assign(pd_scores, pd_bboxes, anc, batch["cls"], gtb,
                                           batch["mask"], topk=10, num_classes=nc, exact_topk=True))

    # --- loss fwd ---
    @jax.jit
    def loss_fwd(feats):
        total, comps, _ = detection_loss(feats, batch, strides, cfg, jnp.asarray(1.0))
        return total

    t_loss = timed(loss_fwd, feats)

    # --- loss bwd ---
    @jax.jit
    def loss_bwd(feats):
        g = jax.grad(lambda fs: detection_loss(fs, batch, strides, cfg, jnp.asarray(1.0))[0])(feats)
        return g

    t_bwd = timed(loss_bwd, feats)

    # --- ablations: cls only / box+dfl only via cfg gains ---
    from dataclasses import replace
    cfg_cls = replace(cfg, box=0.0, dfl=0.0)
    cfg_box = replace(cfg, cls=0.0)

    @jax.jit
    def loss_cls_only(feats):
        return detection_loss(feats, batch, strides, cfg_cls, jnp.asarray(1.0))[0]

    @jax.jit
    def loss_box_only(feats):
        return detection_loss(feats, batch, strides, cfg_box, jnp.asarray(1.0))[0]

    t_cls = timed(loss_cls_only, feats)
    t_box = timed(loss_box_only, feats)

    print(f"shapes: B={b} A={a_total} nc={nc} M={m}")
    print(f"tal.assign approx : {t_tal*1e3:8.2f} ms")
    print(f"tal.assign exact  : {t_tal_exact*1e3:8.2f} ms")
    print(f"loss fwd          : {t_loss*1e3:8.2f} ms")
    print(f"loss fwd+bwd      : {t_bwd*1e3:8.2f} ms")
    print(f"loss fwd cls-gain0 dropped? box/dfl still computed (gains scale only): cls={t_cls*1e3:.2f} box={t_box*1e3:.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
