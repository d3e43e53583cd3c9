"""Detection loss (anchor-free v8 loss with DEAL-YOLO options).

Rebuild of the reference's ``ultralytics/utils/loss.py:294`` (v8DetectionLoss)
and ``:187`` (BboxLoss) as one pure static-shape function:

    concat head maps -> split dist/cls -> make_anchors -> DFL decode ->
    TAL assign (stop-gradient) -> BCE cls + IoU box (+NWD blend) + DFL.

DEAL-YOLO's switches — Wise-IoU v3 instead of CIoU (reference loss.py:197,
hard-coded off in the checked-in source) and the NWD blend
(loss.py:194, ``iou_ratio`` 0.5) — are real config options here.
The Wise-IoU running ``iou_mean`` buffer is explicit state threaded through
the train step (functional counterpart of the reference's module buffer).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.ops.anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors
from experiment_yolo_tpu.ops.boxes import bbox_iou, wasserstein_similarity, wise_iou_loss, xywh2xyxy
from experiment_yolo_tpu.utils import tal


@dataclass(frozen=True)
class LossConfig:
    """Loss hyperparameters (gains mirror cfg/default.yaml: box/cls/dfl)."""

    nc: int = 80
    reg_max: int = 16
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    tal_topk: int = 10
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    use_wiseiou: bool = False  # Wise-IoU v3 (DEAL-YOLO paper runs)
    wiou_ltype: str = "WIoU"  # any of the 11 reference ltypes (metrics.py:567)
    nwd: bool = False  # NWD blend (DEAL-YOLO paper runs)
    iou_ratio: float = 0.5  # weight of IoU term when nwd=True
    # plain-IoU variant zoo (reference metrics.py:75-539, exposed as real
    # config where the reference keeps them as commented-out swaps)
    iou_type: str = "CIoU"  # IoU|GIoU|DIoU|CIoU|EIoU|SIoU|ShapeIoU|PIoU|PIoU2|MPDIoU
    inner_iou: bool = False  # Inner-IoU base term (ratio-shrunk boxes)
    focaler_iou: bool = False  # Focaler-IoU base term (interval remap)
    inner_ratio: float = 0.7
    exact_topk: bool = False  # exact TAL top-k sort (parity runs); default
    # uses TPU approx_max_k at recall 0.99 (~15x faster at 34k anchors)
    focaler_d: float = 0.0
    focaler_u: float = 0.95
    # classification loss: the reference's commented-out zoo (loss.py:303-308)
    # exposed as a real option: bce | focal | varifocal | qualityfocal |
    # slide | emaslide
    cls_loss: str = "bce"
    focal_gamma: float = 1.5
    focal_alpha: float = 0.25
    vfl_gamma: float = 2.0
    vfl_alpha: float = 0.75
    qfl_beta: float = 2.0
    assigner: str = "tal"  # tal | atss
    aux_loss_ratio: float = 0.25  # DetectAux one-to-many head weight (loss.py:321)
    # rematerialize the decode/DFL/IoU chains in the backward pass (saves
    # ~2-3 GB of residuals at DEAL-P2 b128; turn off when HBM allows —
    # skipping the recompute is worth ~5% train step)
    checkpoint_loss: bool = True
    # DFL decode layout: 'off' = (..., 4, reg_max) view (16-lane tiles);
    # 'xla' = 128-lane packed segment-matmul form (ops/anchors.py:
    # dfl_decode_packed); 'pallas' = fused kernel with analytic VJP
    # (ops/pallas/dfl_decode.py). Same math; measured on-chip 2026-08-18:
    # both packed forms LOSE to 'off' (docs/KERNELS.md) — keep 'off'.
    packed_decode: str = "off"
    # analytic custom-VJP forms of the DFL decode + hat-DFL loss (identical
    # math; residuals shrink from (B, A, 4, reg_max)-sized exp/one-hot
    # tensors to (B, A, 4) scalars and the f32 division-backward broadcasts
    # disappear). Values: True/'on' (both), 'decode', 'loss', False/'off'.
    # Only applies when packed_decode == 'off'. On-chip b128 A/B (2026-08-18,
    # docs/KERNELS.md): fused 640 vs autodiff 673 img/s (-5%) — the recompute
    # costs more than the freed bandwidth when HBM is not binding, and the
    # ~2.2 GB it frees does NOT unlock a faster batch (b192 needs 5.7 GB more
    # than the chip has). Default OFF; turn on for memory-bound configs.
    fused_dfl: Any = False


def _df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss over adjacent bins (reference loss.py:236).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in
    [0, reg_max-1). Returns (...,) mean over the 4 sides.

    The bin selection is neither take_along_axis (XLA lowers the tiny
    per-element gather over (B, A, 4, reg_max) to a scalar-indexed loop on
    TPU — measured 184 ms vs 33 ms at DEAL-P2 train shapes) nor a
    materialized one-hot pair: with ``t = min(target, reg_max-1)`` the
    two-bin CE is EXACTLY

        wl*(-logp[tl]) + wr*(-logp[tr]) = logsumexp(d) - sum_r d_r * hat_r,
        hat_r = max(0, 1 - |r - t|)                (triangular hat weights)

    (for the reference's clipped edge case target > reg_max-1, both bins
    collapse onto reg_max-1 with total weight 1 — which is hat at the
    clamped t). The hat mask is a fused compare-iota — nothing of shape
    (B, A, 4, reg_max) is ever materialized in HBM, where the one-hot
    form spent ~45 ms/step in broadcasts at DEAL-P2 b128 shapes.
    """
    reg_max = pred_dist.shape[-1]
    t = jnp.minimum(target, reg_max - 1)[..., None]  # (..., 4, 1)
    bins = jnp.arange(reg_max, dtype=t.dtype)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(bins - t)).astype(pred_dist.dtype)
    m = jax.lax.stop_gradient(pred_dist.max(-1, keepdims=True))
    lse = m[..., 0] + jnp.log(
        jnp.sum(jnp.exp((pred_dist - m).astype(jnp.float32)), axis=-1)
    )
    proj = (pred_dist * hat).sum(-1, dtype=jnp.float32)
    return (lse - proj).mean(-1)


@jax.custom_vjp
def _df_loss_fused(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """:func:`_df_loss` with an analytic VJP (identical forward math).

    Autodiff of the logsumexp keeps the f32 (B, A, 4, reg_max) exp as a
    residual and the hat mask as a second one (~1.6 GB at DEAL-P2 b128);
    the analytic dx = (softmax(x) - hat) * g/4 recomputes both from the
    bf16 logits + tiny (B, A, 4) f32 (max, den) residuals in one fused
    elementwise pass.
    """
    return _df_loss(pred_dist, target)


def _df_loss_fused_fwd(pred_dist, target):
    reg_max = pred_dist.shape[-1]
    t = jnp.minimum(target, reg_max - 1)
    m = pred_dist.max(-1)
    e = jnp.exp((pred_dist - m[..., None]).astype(jnp.float32))
    den = e.sum(-1)
    lse = m.astype(jnp.float32) + jnp.log(den)
    bins = jnp.arange(reg_max, dtype=t.dtype)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(bins - t[..., None])).astype(pred_dist.dtype)
    proj = (pred_dist * hat).sum(-1, dtype=jnp.float32)
    return (lse - proj).mean(-1), (pred_dist, t, m, den)


def _df_loss_fused_bwd(res, g):
    pred_dist, t, m, den = res
    reg_max = pred_dist.shape[-1]
    p = jnp.exp((pred_dist - m[..., None]).astype(jnp.float32)) / den[..., None]
    bins = jnp.arange(reg_max, dtype=t.dtype)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(bins - t[..., None])).astype(jnp.float32)
    dx = (p - hat) * (g / pred_dist.shape[-2]).astype(jnp.float32)[..., None, None]
    # targets are labels (stop-gradient upstream of the assigner): zero tangent
    return dx.astype(pred_dist.dtype), jnp.zeros_like(t)


_df_loss_fused.defvjp(_df_loss_fused_fwd, _df_loss_fused_bwd)


def _df_loss_packed(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Lane-packed :func:`_df_loss`: same logsumexp-minus-hat identity on the
    128-lane layout of ops/anchors.py:dfl_decode_packed (two anchors per
    row for reg_max=16; the (..., 4, 16) view leaves VPU tiles 7/8
    padding). pred_dist (B, A, 4*reg_max) raw; target (B, A, 4).
    Falls back to the unpacked form when the packing doesn't divide."""
    from experiment_yolo_tpu.ops.anchors import packed_segment_matrices

    b, a = pred_dist.shape[0], pred_dist.shape[1]
    side = 4 * reg_max
    if 128 % side != 0 or (b * a * side) % 128 != 0:
        return _df_loss(pred_dist.reshape(b, a, 4, reg_max), target)
    groups = 128 // reg_max
    seg2g, ind, bins = packed_segment_matrices(reg_max)
    seg = seg2g[:, :groups]  # group indicator (sum over bins)
    bins_lane = jnp.asarray(bins)

    x2 = pred_dist.reshape(-1, 128)
    t2 = jnp.minimum(target, reg_max - 1).astype(jnp.float32).reshape(-1, groups)
    t_lane = jnp.dot(t2, jnp.asarray(ind), preferred_element_type=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(bins_lane - t_lane)).astype(pred_dist.dtype)
    # per-GROUP max shift: with a row-global max, a group sitting far below
    # another anchor's logits underflows den -> log(0) = -inf
    mg = jax.lax.stop_gradient(
        x2.reshape(-1, groups, reg_max).max(-1))  # (rows, G)
    m = jnp.broadcast_to(mg[..., None], (*mg.shape, reg_max)).reshape(-1, 128)
    e = jnp.exp((x2 - m).astype(jnp.float32))
    den = jnp.dot(e, jnp.asarray(seg), preferred_element_type=jnp.float32)
    lse = mg.astype(jnp.float32) + jnp.log(den)
    proj = jnp.dot(x2 * hat, jnp.asarray(seg), preferred_element_type=jnp.float32)
    return (lse - proj).reshape(b, a, 4).mean(-1)


def _box_dfl_losses(cfg, pred_distri, pred_bboxes, anchor_points, target_bboxes,
                    fg_mask, weight, target_scores_sum, iou_mean, mpdiou_hw, reg_max, b):
    """(Wise-)IoU (+ NWD blend) box loss and DFL loss, weighted by target
    score (reference BboxLoss.forward, loss.py:187-242). Shared by the main
    and the DetectAux auxiliary branch."""
    hw2 = mpdiou_hw[None] if mpdiou_hw.ndim == 1 else mpdiou_hw  # (B|1, A)
    if cfg.use_wiseiou:
        wiou, new_iou_mean = _masked_wise_iou(
            pred_bboxes, target_bboxes, fg_mask, iou_mean, cfg.wiou_ltype,
            inner=cfg.inner_iou, focaler=cfg.focaler_iou, ratio=cfg.inner_ratio,
            d=cfg.focaler_d, u=cfg.focaler_u, mpdiou_hw=hw2,
        )
        loss_iou = (wiou * weight).sum() / target_scores_sum
    else:
        variant = {} if cfg.iou_type == "IoU" else {cfg.iou_type: True}
        if cfg.iou_type == "MPDIoU":
            variant = {"MPDIoU": True, "mpdiou_hw": hw2[..., None]}
        # checkpoint: the (C)IoU chain is ~30 elementwise steps whose saved
        # (B, A) f32 intermediates cost more HBM than recomputing them in
        # the backward
        _iou_fn = lambda p, t: bbox_iou(
            p, t, xywh=False,
            inner=cfg.inner_iou, focaler=cfg.focaler_iou, ratio=cfg.inner_ratio,
            d=cfg.focaler_d, u=cfg.focaler_u, **variant,
        )[..., 0]
        if cfg.checkpoint_loss:
            _iou_fn = jax.checkpoint(_iou_fn)
        iou = _iou_fn(pred_bboxes, target_bboxes)
        loss_iou = (jnp.where(fg_mask, 1.0 - iou, 0.0) * weight).sum() / target_scores_sum
        new_iou_mean = iou_mean
    if cfg.nwd:
        nwd = wasserstein_similarity(pred_bboxes, target_bboxes)[..., 0]
        nwd_loss = (jnp.where(fg_mask, 1.0 - nwd, 0.0) * weight).sum() / target_scores_sum
        loss_iou = cfg.iou_ratio * loss_iou + (1.0 - cfg.iou_ratio) * nwd_loss

    ap = anchor_points if anchor_points.ndim == 3 else anchor_points[None]
    target_ltrb = bbox2dist(ap, target_bboxes, reg_max)
    # checkpoint: log_softmax + one-hot masks are 3x (B, A, 4, reg_max) f32
    # residuals otherwise (~830 MB at DEAL-P2 shapes)
    fused = cfg.fused_dfl in (True, "on", "loss") and cfg.packed_decode == "off"
    if isinstance(pred_distri, (list, tuple)):
        # per-level path: the adjacent-bin CE runs in each head map's native
        # (B, H, W, 4*reg_max) NHWC layout — per-anchor math is identical to
        # the flat form, but the (B, A, 4*reg_max) concat and the (B, HW, no)
        # re-layout copies it forces disappear from the program
        # (docs/KERNELS.md chip session 3 cost audit)
        _fn = _df_loss_fused if fused else _df_loss
        if cfg.checkpoint_loss and not fused:
            _fn = jax.checkpoint(_fn)
        parts, off = [], 0
        for d in pred_distri:
            _, hh, ww, _ = d.shape
            n = hh * ww
            t = target_ltrb[:, off:off + n].reshape(b, hh, ww, 4)
            parts.append(_fn(d.reshape(b, hh, ww, 4, reg_max), t).reshape(b, n))
            off += n
        dfl = jnp.concatenate(parts, 1)  # (B, A)
    else:
        if cfg.packed_decode != "off":
            _dfl_fn = lambda pd, t: _df_loss_packed(pd, t, reg_max)
        elif fused:
            _dfl_fn = lambda pd, t: _df_loss_fused(pd.reshape(b, -1, 4, reg_max), t)
        else:
            _dfl_fn = lambda pd, t: _df_loss(pd.reshape(b, -1, 4, reg_max), t)
        if cfg.checkpoint_loss and not fused:
            # the fused form's residuals are already minimal (logits +
            # (B, A, 4) scalars); checkpointing would only rerun the forward
            _dfl_fn = jax.checkpoint(_dfl_fn)
        dfl = _dfl_fn(pred_distri, target_ltrb)  # (B, A)
    loss_dfl = (jnp.where(fg_mask, dfl, 0.0) * weight).sum() / target_scores_sum
    return loss_iou, loss_dfl, new_iou_mean


def _per_level_decode(dists, anchor_points, feat_shapes, b, dec_fn):
    """Apply ``dec_fn(dist_map, (1, H, W, 2) anchors)`` to each level's
    (B, H, W, 4*reg_max) map and concatenate to (B, A, 4) — shared by the
    main and DetectAux heads so the offset/reshape bookkeeping cannot
    drift between them."""
    parts, off = [], 0
    for d, (hh, ww) in zip(dists, feat_shapes):
        ap2 = anchor_points[off:off + hh * ww].reshape(hh, ww, 2)[None]
        parts.append(dec_fn(d, ap2).reshape(b, -1, 4))
        off += hh * ww
    return jnp.concatenate(parts, 1)


def detection_loss(
    feats: Sequence[jnp.ndarray],  # per-level (B, H, W, 4*reg_max + nc) raw maps
    batch: Dict[str, jnp.ndarray],  # cls (B,M), bboxes (B,M,4) normalized xywh, mask (B,M)
    strides: Sequence[int],
    cfg: LossConfig,
    iou_mean: jnp.ndarray | None = None,  # Wise-IoU running state (scalar)
    slide_mean: jnp.ndarray | None = None,  # EMASlide running IoU (scalar)
    step: jnp.ndarray | None = None,  # optimizer step (EMASlide decay ramp)
    return_aux: bool = False,  # also return assignment internals (task losses)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
    """Compute (total_loss, components, new_iou_mean).

    Total is ``(box*g_box + cls*g_cls + dfl*g_dfl) * batch_size`` — the same
    scale as the reference's ``loss.sum() * batch_size`` so LR settings
    transfer. Running states (Wise-IoU mean; EMASlide mean when
    cls_loss='emaslide') are explicit inputs/outputs — the trainer threads
    them through TrainState.

    With ``return_aux=True`` a dict of assignment internals (fg_mask,
    target_gt_idx, target_bboxes in grid units, target_scores_sum,
    stride_tensor, imgsz) is appended to the return tuple — the shared core
    for v8Segmentation/Pose losses (reference loss.py:526,709 reuse the
    same assign + BboxLoss machinery).
    """
    nc, reg_max = cfg.nc, cfg.reg_max
    # DetectAux (extra head.py:235): 2*nl maps arrive at train time — the
    # first nl are the main head, the rest the auxiliary one-to-many head
    aux_feats = None
    if len(feats) == 2 * len(strides):
        feats, aux_feats = feats[: len(strides)], feats[len(strides) :]
    b = feats[0].shape[0]
    # Scores concatenate (the assigner and the cls-loss zoo are
    # anchor-global), but the 4*reg_max distribution half stays PER-LEVEL:
    # the decode and the adjacent-bin CE are purely per-anchor, and running
    # them in each head map's native NHWC layout removes the (B, A, 64)
    # concat plus the (B, HW, no) re-layout copies from the compiled step
    # (docs/KERNELS.md chip session 3; mirrors the inference-side per-level
    # decode that measured +27%). The packed layouts need the flat form.
    per_level = cfg.packed_decode == "off"
    pred_scores = jnp.concatenate(
        [f[..., reg_max * 4:].reshape(b, -1, nc) for f in feats], axis=1)  # (B, A, nc)
    if per_level:
        pred_distri = [f[..., : reg_max * 4] for f in feats]  # (B, H, W, 64) each
    else:
        pred_distri = jnp.concatenate(
            [f[..., : reg_max * 4].reshape(b, -1, reg_max * 4) for f in feats], axis=1)
    dtype = pred_scores.dtype

    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)  # (A,2), (A,1)
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]

    # targets: normalized xywh -> pixel xyxy, padded rows masked. Geometry is
    # ALWAYS f32: bf16 spacing at coordinate 160 is 1.0 grid units, which
    # would corrupt IoU; the (B, A|M, 4) tensors are small so f32 is free.
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask"].astype(jnp.bool_) & (gt_bboxes.sum(-1) > 0)
    gt_bboxes = jnp.where(mask_gt[..., None], gt_bboxes, 0.0)
    gt_labels = batch["cls"].astype(jnp.int32)

    # decode predictions (grid units)
    # checkpoint: the decode's softmax residual is (B, A, 4, reg_max) f32
    # (~310 MB at DEAL-P2 train shapes); recompute it in the backward
    fused_dec = cfg.fused_dfl in (True, "on", "decode")
    if cfg.packed_decode == "xla":
        from experiment_yolo_tpu.ops.anchors import dfl_decode_packed as _dfl
    elif cfg.packed_decode == "pallas":
        from experiment_yolo_tpu.ops.pallas.dfl_decode import dfl_decode_pallas as _dfl
    elif fused_dec:
        from experiment_yolo_tpu.ops.anchors import dfl_decode_fused as _dfl
    else:
        _dfl = dfl_decode
    # the pallas kernel's and the fused form's VJPs already recompute from
    # the input; wrapping them in jax.checkpoint would just run the forward
    # twice
    ckpt_dec = cfg.checkpoint_loss and cfg.packed_decode != "pallas" and not (
        fused_dec and cfg.packed_decode == "off")
    if per_level:
        _dec_level = lambda d, ap2: dist2bbox(_dfl(d, reg_max), ap2, xywh=False)
        if ckpt_dec:
            _dec_level = jax.checkpoint(_dec_level)
        pred_bboxes = _per_level_decode(pred_distri, anchor_points, feat_shapes, b, _dec_level)
    else:
        _dec_fn = lambda d: dist2bbox(_dfl(d, reg_max), anchor_points[None], xywh=False)
        if ckpt_dec:
            _dec_fn = jax.checkpoint(_dec_fn)
        pred_bboxes = _dec_fn(pred_distri)  # (B,A,4) f32 (bf16 exp, f32 accumulators)

    if cfg.assigner == "atss":
        from experiment_yolo_tpu.utils import atss

        res = atss.assign(
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            stride_tensor,
            tuple(tuple(s) for s in feat_shapes),
            tuple(strides),
            gt_labels,
            gt_bboxes,
            mask_gt,
            num_classes=nc,
        )
    else:
        res = tal.assign(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
            topk=cfg.tal_topk,
            num_classes=nc,
            exact_topk=cfg.exact_topk,
            alpha=cfg.tal_alpha,
            beta=cfg.tal_beta,
        )
    # keep targets in the score dtype (bf16 under AMP): ATSS returns f32
    # targets (it never sees the scores), which would otherwise promote the
    # (B, A, nc) BCE elementwise to f32
    target_scores = jax.lax.stop_gradient(res.target_scores).astype(dtype)
    fg_mask = res.fg_mask
    target_bboxes = res.target_bboxes / stride_tensor[None]  # grid units
    target_scores_sum = jnp.maximum(target_scores.sum(dtype=jnp.float32), 1.0)

    # --- cls loss (zoo; reference loss.py:303-308 + 396-458) ---------------
    loss_cls, new_slide_mean = _cls_loss(
        cfg, pred_scores, target_scores, res.target_labels, pred_bboxes, target_bboxes,
        fg_mask, target_scores_sum, slide_mean, step,
    )

    # --- box + dfl (shared with the aux head below) -------------------------
    # sum(-1) has exactly one nonzero per anchor (one-hot * norm), so it is
    # exact in bf16; cast to f32 for the weighted reductions downstream
    weight = jnp.where(fg_mask, target_scores.sum(-1), 0.0).astype(jnp.float32)  # (B, A)
    if iou_mean is None:
        iou_mean = jnp.asarray(1.0, dtype)
    # per-anchor image-diagonal^2 in grid units (reference loss.py:444 passes
    # (H^2+W^2)/stride^2 into the MPDIoU branches)
    mpdiou_hw = (imgsz_h**2 + imgsz_w**2) / stride_tensor[:, 0] ** 2  # (A,)
    # NOTE: a foreground-compacted variant (gather box/DFL to the <=topk*M
    # positive anchors) was measured SLOWER on-chip (220.6 -> 201.6 img/s):
    # the backward of the gather scatters into the dense (B, A, 64) grad
    # anyway, so the dense traffic remains and the top_k+gather is pure
    # overhead. Keep the dense masked formulation — XLA fuses it well.
    loss_iou, loss_dfl, new_iou_mean = _box_dfl_losses(
        cfg, pred_distri, pred_bboxes, anchor_points, target_bboxes,
        fg_mask, weight, target_scores_sum, iou_mean, mpdiou_hw, reg_max, b,
    )

    comps = {
        "box": loss_iou * cfg.box,
        "cls": loss_cls * cfg.cls,
        "dfl": loss_dfl * cfg.dfl,
    }

    if aux_feats is not None:
        # Auxiliary one-to-many head (reference loss.py:459 compute_loss_aux):
        # targets assigned from the MAIN head's detached predictions with a
        # looser assigner (topk 13, alpha 0.5, beta 6.0), losses computed on
        # the AUX predictions at aux_loss_ratio=0.25. The aux branch uses
        # plain BCE for cls (the reference's default self.bce) and does not
        # advance the Wise-IoU running mean.
        pred_scores_aux = jnp.concatenate(
            [f[..., reg_max * 4:].reshape(b, -1, nc) for f in aux_feats], axis=1)
        if per_level:
            pred_distri_aux = [f[..., : reg_max * 4] for f in aux_feats]
            pred_bboxes_aux = _per_level_decode(
                pred_distri_aux, anchor_points, feat_shapes, b,
                lambda d, ap2: dist2bbox(dfl_decode(d, reg_max), ap2, xywh=False),
            )
        else:
            pred_distri_aux = jnp.concatenate(
                [f[..., : reg_max * 4].reshape(b, -1, reg_max * 4) for f in aux_feats], axis=1)
            pred_bboxes_aux = dist2bbox(
                dfl_decode(pred_distri_aux, reg_max), anchor_points[None], xywh=False
            )
        res_aux = tal.assign(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
            topk=13,
            exact_topk=cfg.exact_topk,
            num_classes=nc,
            alpha=0.5,
            beta=6.0,
        )
        ts_aux = jax.lax.stop_gradient(res_aux.target_scores)
        fg_aux = res_aux.fg_mask
        tb_aux = res_aux.target_bboxes / stride_tensor[None]
        tss_aux = jnp.maximum(ts_aux.sum(dtype=jnp.float32), 1.0)
        w_aux = jnp.where(fg_aux, ts_aux.sum(-1), 0.0).astype(jnp.float32)
        ratio = cfg.aux_loss_ratio
        cls_aux = _bce_sum(pred_scores_aux, ts_aux.astype(dtype)) / tss_aux
        iou_aux, dfl_aux, _ = _box_dfl_losses(
            cfg, pred_distri_aux, pred_bboxes_aux, anchor_points, tb_aux,
            fg_aux, w_aux, tss_aux, iou_mean, mpdiou_hw, reg_max, b,
        )
        comps = {
            "box": comps["box"] + iou_aux * ratio * cfg.box,
            "cls": comps["cls"] + cls_aux * ratio * cfg.cls,
            "dfl": comps["dfl"] + dfl_aux * ratio * cfg.dfl,
        }

    total = (comps["box"] + comps["cls"] + comps["dfl"]) * b
    out = (total, comps, new_iou_mean)
    if slide_mean is not None:
        out = out + (new_slide_mean,)
    if return_aux:
        aux = {
            "fg_mask": fg_mask,
            "target_gt_idx": res.target_gt_idx,
            "target_bboxes": target_bboxes,  # grid units
            "target_scores_sum": target_scores_sum,
            "weight": weight,
            "stride_tensor": stride_tensor,
            "anchor_points": anchor_points,
            "imgsz": (imgsz_h, imgsz_w),
        }
        out = out + (aux,)
    return out


def _sigmoid_bce(logits, targets):
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@jax.custom_vjp
def _bce_sum(logits, targets):
    """``_sigmoid_bce(logits, targets).sum(dtype=f32)`` with an analytic,
    residual-free backward: d/dlogits = sigmoid(logits) - targets,
    d/dtargets = -logits. Autodiff of the stable log1p(exp(-|x|)) form saves
    two activation-sized intermediates (the exp and the |x| sign) for the
    backward; at DEAL-P2 b128 the (128, 33600, 80) cls tensors make that
    ~1.1 GB of HBM writes+reads per step. Here the backward is one fused
    elementwise pass over (logits, targets) only."""
    return _sigmoid_bce(logits, targets).sum(dtype=jnp.float32)


def _bce_sum_fwd(logits, targets):
    return _bce_sum(logits, targets), (logits, targets)


def _bce_sum_bwd(res, g):
    logits, targets = res
    d = jax.nn.sigmoid(logits.astype(jnp.float32)) - targets.astype(jnp.float32)
    return (d * g).astype(logits.dtype), (-logits.astype(jnp.float32) * g).astype(targets.dtype)


_bce_sum.defvjp(_bce_sum_fwd, _bce_sum_bwd)


def _cls_loss(cfg, pred_scores, target_scores, target_labels, pred_bboxes, target_bboxes,
              fg_mask, target_scores_sum, slide_mean, step):
    """Classification loss zoo. Returns (loss, new_slide_mean)."""
    dtype = pred_scores.dtype
    new_slide_mean = slide_mean
    if cfg.cls_loss == "bce":
        # elementwise BCE in the input dtype (bf16 under AMP); f32 accumulator,
        # analytic one-pass backward (_bce_sum)
        loss = _bce_sum(pred_scores, target_scores) / target_scores_sum
    elif cfg.cls_loss == "focal":
        # FocalLoss_YOLO (reference loss.py:166-186)
        bce = _sigmoid_bce(pred_scores, target_scores)
        p = jax.nn.sigmoid(pred_scores)
        p_t = target_scores * p + (1 - target_scores) * (1 - p)
        mod = (1.0 - p_t) ** cfg.focal_gamma
        alpha_f = target_scores * cfg.focal_alpha + (1 - target_scores) * (1 - cfg.focal_alpha)
        loss = (bce * mod * alpha_f).sum(dtype=jnp.float32) / target_scores_sum
    elif cfg.cls_loss == "varifocal":
        # VarifocalLoss_YOLO (loss.py:128-143), normalized by fg count
        q = target_scores
        weight = cfg.vfl_alpha * jnp.abs(jax.nn.sigmoid(pred_scores) - q) ** cfg.vfl_gamma * (q <= 0) + q * (q > 0)
        loss = (_sigmoid_bce(pred_scores, q) * jax.lax.stop_gradient(weight)).sum(dtype=jnp.float32) / jnp.maximum(fg_mask.sum(), 1)
    elif cfg.cls_loss == "qualityfocal":
        # QualityfocalLoss_YOLO (loss.py:145-158): q = IoU * onehot on fg
        iou = jnp.clip(bbox_iou(pred_bboxes, target_bboxes, xywh=False)[..., 0], 1e-6, None)
        iou = jax.lax.stop_gradient(iou)
        onehot = jax.nn.one_hot(target_labels, cfg.nc, dtype=dtype)
        pos = fg_mask[..., None] * onehot
        q = jnp.where(pos > 0, iou[..., None] * onehot, 0.0)
        p = jax.nn.sigmoid(pred_scores)
        scale = jnp.where(pos > 0, jnp.abs(q - p), p) ** cfg.qfl_beta
        loss = (_sigmoid_bce(pred_scores, q) * scale).sum(dtype=jnp.float32) / jnp.maximum(fg_mask.sum(), 1)
    elif cfg.cls_loss in ("slide", "emaslide"):
        # Slide / EMASlide (loss.py:15-74): modulate BCE by where the target
        # score sits relative to auto_iou (mean fg CIoU)
        iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)[..., 0]
        fg_cnt = jnp.maximum(fg_mask.sum(), 1)
        auto_iou = jax.lax.stop_gradient(jnp.where(fg_mask, iou, 0.0).sum() / fg_cnt)
        if cfg.cls_loss == "emaslide":
            upd = (step if step is not None else jnp.asarray(1, jnp.int32)).astype(jnp.float32) + 1.0
            d = 0.999 * (1.0 - jnp.exp(-upd / 2000.0))
            sm = slide_mean if slide_mean is not None else jnp.asarray(1.0, jnp.float32)
            new_slide_mean = d * sm + (1 - d) * auto_iou
            auto_iou = new_slide_mean
        auto_iou = jnp.maximum(auto_iou, 0.2)
        t = target_scores
        w = (
            1.0 * (t <= auto_iou - 0.1)
            + jnp.exp(1.0 - auto_iou) * ((t > auto_iou - 0.1) & (t < auto_iou))
            + jnp.exp(-(t - 1.0)) * (t >= auto_iou)
        )
        loss = (_sigmoid_bce(pred_scores, t) * w).sum(dtype=jnp.float32) / target_scores_sum
    else:
        raise ValueError(f"unknown cls_loss {cfg.cls_loss!r}")
    return loss, new_slide_mean


def _masked_wise_iou(pred, target, fg_mask, iou_mean, ltype, **wise_kwargs):
    """Wise-IoU over all anchors with the running-mean update computed only
    from foreground anchors (the reference computes it over the fg subset)."""
    # loss values for all anchors; focusing uses the global iou_mean state
    pred_xy_loss, _ = wise_iou_loss(pred, target, iou_mean, ltype=ltype, **wise_kwargs)
    # recompute the mean update restricted to fg (reference semantics)
    iou_l = _plain_iou_loss(pred, target)
    fg_count = jnp.maximum(fg_mask.sum(), 1)
    fg_mean = (jnp.where(fg_mask, iou_l, 0.0).sum() / fg_count)
    new_mean = iou_mean * (1 - 1e-2) + 1e-2 * jax.lax.stop_gradient(fg_mean)
    return jnp.where(fg_mask, pred_xy_loss, 0.0), new_mean


def _plain_iou_loss(pred, target, eps=1e-7):
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    inter = jnp.clip(rb - lt, 0, None).prod(-1)
    area_p = jnp.clip(pred[..., 2:4] - pred[..., :2], 0, None).prod(-1)
    area_t = jnp.clip(target[..., 2:4] - target[..., :2], 0, None).prod(-1)
    return 1.0 - inter / (area_p + area_t - inter + eps)
