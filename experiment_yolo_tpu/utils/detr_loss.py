"""DETR loss for RT-DETR training: Hungarian matching + VFL/L1/GIoU.

Rebuild of the reference's ``models/utils/loss.py`` (DETRLoss /
RTDETRDetectionLoss) and ``models/utils/ops.py:HungarianMatcher``.

The bipartite matching is exact ``scipy.optimize.linear_sum_assignment``
invoked through ``jax.pure_callback`` — the cost matrix is computed on
device, the (tiny) assignment solves on host, and everything around it
stays one jitted program with static shapes (the reference similarly drops
to CPU scipy inside its torch loss). Denoising groups are not yet wired.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.ops.boxes import bbox_iou

# cost / loss gains (reference DETRLoss defaults)
COST_CLASS, COST_BBOX, COST_GIOU = 2.0, 5.0, 2.0
GAIN_CLASS, GAIN_BBOX, GAIN_GIOU = 1.0, 5.0, 2.0
FL_ALPHA, FL_GAMMA = 0.25, 2.0


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Batched host-side Hungarian assignment.

    cost (B, Q, M) float32; n_valid (B,) int32 actual gt counts.
    Returns (B, M) int32: matched query index per gt slot (-1 for padding).
    """
    import scipy.optimize

    b, q, m = cost.shape
    out = np.full((b, m), -1, np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = scipy.optimize.linear_sum_assignment(cost[i, :, :n])
        out[i, cols] = rows.astype(np.int32)
    return out


def match_cost(pred_bboxes, pred_scores, gt_bboxes, gt_cls) -> jnp.ndarray:
    """(B, Q, M) matching cost: 2*focal_class + 5*L1 + 2*(1-GIoU)."""
    b, q, nc = pred_scores.shape
    p = jax.nn.sigmoid(pred_scores)
    pc = jnp.take_along_axis(
        p[:, :, None, :], jnp.clip(gt_cls, 0, nc - 1)[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (B, Q, M)
    neg_cost = (1 - FL_ALPHA) * pc**FL_GAMMA * -jnp.log(1 - pc + 1e-8)
    pos_cost = FL_ALPHA * (1 - pc) ** FL_GAMMA * -jnp.log(pc + 1e-8)
    cost_class = pos_cost - neg_cost
    cost_bbox = jnp.abs(pred_bboxes[:, :, None] - gt_bboxes[:, None]).sum(-1)
    giou = bbox_iou(pred_bboxes[:, :, None], gt_bboxes[:, None], xywh=True, GIoU=True)[..., 0]
    cost = COST_CLASS * cost_class + COST_BBOX * cost_bbox + COST_GIOU * (1.0 - giou)
    return jnp.where(jnp.isfinite(cost), cost, 1e6)


def greedy_match(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt) -> jnp.ndarray:
    """On-device greedy query-per-gt assignment (B, M) int32 (-1 = padding).

    Sharding-safe stand-in for exact Hungarian matching (host callbacks
    deadlock XLA's SPMD collectives): gts are processed globally cheapest-
    first, each taking its lowest-cost unused query. With nq (300) >> gts
    per image this agrees with the optimal assignment except under heavy
    query contention.
    """
    cost = match_cost(pred_bboxes, pred_scores, gt_bboxes, gt_cls)
    b, q, m = cost.shape
    big = 1e9
    cost = jnp.where(mask_gt[:, None, :], cost, big)

    def body(_, carry):
        cost_c, out = carry
        # globally cheapest remaining (query, gt) pair per image
        flat = cost_c.reshape(b, q * m)
        idx = flat.argmin(-1)
        qi, mi = idx // m, idx % m
        val = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0]
        ok = val < big
        out = out.at[jnp.arange(b), mi].set(jnp.where(ok, qi, out[jnp.arange(b), mi]))
        # retire the chosen row and column
        cost_c = jnp.where(ok[:, None, None] & (jnp.arange(q)[None, :, None] == qi[:, None, None]), big, cost_c)
        cost_c = jnp.where(ok[:, None, None] & (jnp.arange(m)[None, None, :] == mi[:, None, None]), big, cost_c)
        return cost_c, out

    out0 = jnp.full((b, m), -1, jnp.int32)
    _, out = jax.lax.fori_loop(0, m, body, (cost, out0))
    return jnp.where(mask_gt, out, -1)


def hungarian_match(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt) -> jnp.ndarray:
    """Exact query-per-gt assignment (B, M) int32 (-1 = padded gt) via a
    scipy host callback. Single-device only — under multi-device SPMD the
    callback stalls the collective rendezvous; use greedy_match there.

    pred_bboxes (B,Q,4) normalized cxcywh; pred_scores (B,Q,nc) logits;
    gt_bboxes (B,M,4) normalized cxcywh; gt_cls (B,M); mask_gt (B,M) bool.
    Cost = 2*focal_class + 5*L1 + 2*GIoU (HungarianMatcher defaults).
    """
    b, q, nc = pred_scores.shape
    m = gt_bboxes.shape[1]
    p = jax.nn.sigmoid(pred_scores)
    # focal-style class cost at each gt's class (matcher use_fl=True branch)
    pc = jnp.take_along_axis(
        p[:, :, None, :], jnp.clip(gt_cls, 0, nc - 1)[:, None, :, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (B, Q, M)
    neg_cost = (1 - FL_ALPHA) * pc**FL_GAMMA * -jnp.log(1 - pc + 1e-8)
    pos_cost = FL_ALPHA * (1 - pc) ** FL_GAMMA * -jnp.log(pc + 1e-8)
    cost_class = pos_cost - neg_cost
    cost_bbox = jnp.abs(pred_bboxes[:, :, None] - gt_bboxes[:, None]).sum(-1)  # L1 (B,Q,M)
    giou = bbox_iou(pred_bboxes[:, :, None], gt_bboxes[:, None], xywh=True, GIoU=True)[..., 0]
    cost = COST_CLASS * cost_class + COST_BBOX * cost_bbox + COST_GIOU * (1.0 - giou)
    cost = jnp.where(jnp.isfinite(cost), cost, 1e6)
    # sort valid gts to the front for the host solver
    order = jnp.argsort(~mask_gt, axis=1, stable=True)  # valid first
    cost_sorted = jnp.take_along_axis(cost, order[:, None, :], axis=2)
    n_valid = mask_gt.sum(-1).astype(jnp.int32)
    matched_sorted = jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, m), jnp.int32),
        cost_sorted.astype(jnp.float32),
        n_valid,
        vmap_method="sequential",
    )
    # unsort back to original gt positions
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(matched_sorted, inv, axis=1)


def _layer_loss(pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt, matched, nc):
    """Loss for one decoder layer given the matching (B, M) query-per-gt."""
    b, q, _ = pred_scores.shape
    valid = mask_gt & (matched >= 0)
    midx = jnp.clip(matched, 0, q - 1)
    num_gts = jnp.maximum(valid.sum(), 1).astype(pred_scores.dtype)

    # gather matched predictions per gt slot
    pb = jnp.take_along_axis(pred_bboxes, midx[..., None], axis=1)  # (B, M, 4)
    iou = bbox_iou(pb, gt_bboxes, xywh=True)[..., 0]
    iou = jnp.where(valid, jax.lax.stop_gradient(iou), 0.0)

    # scatter to per-query targets: class + iou-aware score. Invalid gt
    # slots scatter to index q, dropped as out-of-bounds (mode='drop').
    tgt_cls = jnp.full((b, q), nc, jnp.int32)  # background
    tgt_score = jnp.zeros((b, q), pred_scores.dtype)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], valid.shape)
    sidx = jnp.where(valid, midx, q)
    tgt_cls = tgt_cls.at[bidx, sidx].set(gt_cls.astype(jnp.int32), mode="drop")
    tgt_score = tgt_score.at[bidx, sidx].max(iou, mode="drop")
    one_hot = jax.nn.one_hot(tgt_cls, nc + 1, dtype=pred_scores.dtype)[..., :nc]
    gt_scores = tgt_score[..., None] * one_hot

    # VarifocalLoss (reference loss.py:77-90), normalized like _get_loss_class
    pred_sig = jax.nn.sigmoid(pred_scores)
    weight = 0.75 * pred_sig**2.0 * (1 - one_hot) + gt_scores * one_hot
    bce = jnp.clip(pred_scores, 0, None) - pred_scores * gt_scores + jnp.log1p(jnp.exp(-jnp.abs(pred_scores)))
    loss_cls = (bce * jax.lax.stop_gradient(weight)).mean(1).sum() / (num_gts / q) * GAIN_CLASS

    l1 = jnp.where(valid[..., None], jnp.abs(pb - gt_bboxes), 0.0).sum() / num_gts * GAIN_BBOX
    giou = bbox_iou(pb, gt_bboxes, xywh=True, GIoU=True)[..., 0]
    loss_giou = (jnp.where(valid, 1.0 - giou, 0.0)).sum() / num_gts * GAIN_GIOU
    return loss_cls, l1, loss_giou


def rtdetr_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], nc: int, matcher: str = "greedy"):
    """Full RT-DETR training loss: last layer + aux layers + encoder outputs.

    outputs: RTDETRDecoder train-mode dict (dec_bboxes (L,B,Q,4) normalized
    cxcywh, dec_scores (L,B,Q,nc), enc_bboxes, enc_scores).
    batch: bboxes (B,M,4) normalized cxcywh, cls (B,M), mask (B,M).
    """
    gt_bboxes = batch["bboxes"].astype(jnp.float32)
    gt_cls = batch["cls"].astype(jnp.int32)
    mask_gt = batch["mask"].astype(jnp.bool_) & (gt_bboxes[..., 2:4] > 0).all(-1)

    n_layers = outputs["dec_bboxes"].shape[0]
    layers = [(outputs["dec_bboxes"][i], outputs["dec_scores"][i]) for i in range(n_layers)]
    layers.append((outputs["enc_bboxes"], outputs["enc_scores"]))
    total = 0.0
    comps = {}
    match_fn = greedy_match if matcher == "greedy" else hungarian_match
    for li, (pb, ps) in enumerate(layers):
        matched = match_fn(jax.lax.stop_gradient(pb), jax.lax.stop_gradient(ps), gt_bboxes, gt_cls, mask_gt)
        lc, lb, lg = _layer_loss(pb, ps, gt_bboxes, gt_cls, mask_gt, matched, nc)
        total = total + lc + lb + lg
        if li == n_layers - 1:  # report the final decoder layer's components
            comps = {"cls": lc, "bbox": lb, "giou": lg}
    if "dn_bboxes" in outputs:
        # denoising loss (reference RTDETRDetectionLoss): matching is KNOWN —
        # positive query g*M+j reconstructs gt j; negatives stay background.
        # Tile the gts num_group times so _layer_loss's scatter covers every
        # positive group; the scatter targets land in the positive half.
        ng = int(outputs["dn_num_group"])
        b, m = gt_cls.shape
        rep = lambda t: jnp.tile(t, (1, ng) + (1,) * (t.ndim - 2))
        gt_b_r, gt_c_r, mask_r = rep(gt_bboxes), rep(gt_cls), rep(mask_gt)
        matched_dn = jnp.broadcast_to(jnp.arange(ng * m)[None], (b, ng * m))
        for i in range(outputs["dn_bboxes"].shape[0]):
            lc, lb, lg = _layer_loss(outputs["dn_bboxes"][i], outputs["dn_scores"][i],
                                     gt_b_r, gt_c_r, mask_r, matched_dn, nc)
            total = total + lc + lb + lg
            if i == outputs["dn_bboxes"].shape[0] - 1:
                comps = {**comps, "dn_cls": lc, "dn_bbox": lb, "dn_giou": lg}
    return total, comps
