"""Bisect the 210 ms detection_loss fwd program stage by stage."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.ops.anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors
from experiment_yolo_tpu.ops.boxes import xywh2xyxy
from experiment_yolo_tpu.utils import tal
from experiment_yolo_tpu.utils.loss import (
    LossConfig, _box_dfl_losses, _cls_loss, _df_loss, _sigmoid_bce,
)


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    b, nc, reg_max, m = 32, 6, 16, 16
    strides = (4, 8, 16)
    imgsz = 640
    shapes = [(imgsz // s, imgsz // s) for s in strides]
    no = nc + 4 * reg_max
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(b, h, w, no).astype(np.float32)) for h, w in shapes]
    batch = {
        "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (b, m, 4)).astype(np.float32)),
        "cls": jnp.asarray(rng.randint(0, nc, (b, m)), jnp.int32),
        "mask": jnp.asarray(np.tile(np.arange(m) < 6, (b, 1))),
    }
    cfg = LossConfig(nc=nc)

    def prelude(feats):
        flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
        pred_distri, pred_scores = flat[..., : reg_max * 4], flat[..., reg_max * 4 :]
        feat_shapes = [f.shape[1:3] for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
        scale = jnp.asarray([imgsz, imgsz, imgsz, imgsz], jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)
        mask_gt = batch["mask"] & (gt_bboxes.sum(-1) > 0)
        gt_bboxes = jnp.where(mask_gt[..., None], gt_bboxes, 0.0)
        gt_labels = batch["cls"]
        pred_bboxes = dist2bbox(dfl_decode(pred_distri, reg_max), anchor_points[None], xywh=False)
        return pred_distri, pred_scores, anchor_points, stride_tensor, gt_bboxes, mask_gt, gt_labels, pred_bboxes

    @jax.jit
    def s1_decode(feats):
        pd, ps, ap, st, gb, mg, gl, pb = prelude(feats)
        return pb.sum() + ps.sum()

    @jax.jit
    def s2_tal(feats):
        pd, ps, ap, st, gb, mg, gl, pb = prelude(feats)
        res = tal.assign(jax.lax.stop_gradient(jax.nn.sigmoid(ps)),
                         jax.lax.stop_gradient(pb * st[None]), ap * st, gl, gb, mg,
                         topk=cfg.tal_topk, num_classes=nc)
        return res.target_scores.sum() + pb.sum()

    @jax.jit
    def s3_cls(feats):
        pd, ps, ap, st, gb, mg, gl, pb = prelude(feats)
        res = tal.assign(jax.lax.stop_gradient(jax.nn.sigmoid(ps)),
                         jax.lax.stop_gradient(pb * st[None]), ap * st, gl, gb, mg,
                         topk=cfg.tal_topk, num_classes=nc)
        ts = jax.lax.stop_gradient(res.target_scores)
        tss = jnp.maximum(ts.sum(), 1.0)
        tb = res.target_bboxes / st[None]
        lc, _ = _cls_loss(cfg, ps, ts, res.target_labels, pb, tb, res.fg_mask, tss, None, None)
        return lc

    @jax.jit
    def s4_box(feats):
        pd, ps, ap, st, gb, mg, gl, pb = prelude(feats)
        res = tal.assign(jax.lax.stop_gradient(jax.nn.sigmoid(ps)),
                         jax.lax.stop_gradient(pb * st[None]), ap * st, gl, gb, mg,
                         topk=cfg.tal_topk, num_classes=nc)
        ts = jax.lax.stop_gradient(res.target_scores)
        tss = jnp.maximum(ts.sum(), 1.0)
        tb = res.target_bboxes / st[None]
        w = jnp.where(res.fg_mask, ts.sum(-1), 0.0)
        hw2 = (imgsz**2 + imgsz**2) / st[:, 0] ** 2
        li, ld, _ = _box_dfl_losses(cfg, pd, pb, ap, tb, res.fg_mask, w, tss,
                                    jnp.asarray(1.0), hw2, reg_max, b)
        return li + ld

    @jax.jit
    def s5_all(feats):
        return s3_cls(feats) + s4_box(feats)

    print(f"s1 decode          : {timed(s1_decode, feats):8.2f} ms")
    print(f"s2 +tal            : {timed(s2_tal, feats):8.2f} ms")
    print(f"s3 +cls loss       : {timed(s3_cls, feats):8.2f} ms")
    print(f"s4 tal+box/dfl     : {timed(s4_box, feats):8.2f} ms")
    print(f"s5 cls+box (2xtal) : {timed(s5_all, feats):8.2f} ms")


if __name__ == "__main__":
    main()
