"""Segmentation / Pose / OBB training losses — static-shape JAX rebuilds.

Counterparts of the reference's ``v8SegmentationLoss`` (loss.py:526),
``v8PoseLoss`` (loss.py:709) and ``v8OBBLoss`` (loss.py:~880). The det part
(assign + box/cls/dfl) is shared with ``detection_loss`` via its
``return_aux`` internals; the task terms are added here.

TPU-shaping decisions vs the torch originals:

- the reference's per-image Python loops over foreground anchors become
  masked fixed-shape computations;
- the segmentation mask term selects a fixed ``max_fg`` top-weight
  foreground anchors per image (the reference's dynamic ``fg_mask``
  boolean indexing is unbounded) — K >= typical fg count, so the result
  matches the reference whenever fg <= K, and degrades gracefully (keeps
  the highest-weight anchors) beyond;
- gt masks arrive as ONE overlap-index image per sample ((B, Hm, Wm),
  value i+1 = instance i, the reference's ``overlap_mask=True`` default) —
  the memory-lean format the reference also prefers.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.ops.anchors import bbox2dist, dfl_decode, dist2rbox, make_anchors
from experiment_yolo_tpu.ops.boxes import probiou, xywh2xyxy
from experiment_yolo_tpu.utils import tal
from experiment_yolo_tpu.utils.loss import LossConfig, _df_loss, _sigmoid_bce, detection_loss

# COCO 17-keypoint OKS sigmas (reference metrics.py:14)
OKS_SIGMA = (
    np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask values outside each box (reference ops.py:755).

    masks (..., H, W); boxes (..., 4) xyxy in mask-pixel coords."""
    h, w = masks.shape[-2:]
    r = jnp.arange(w, dtype=boxes.dtype)[None, :]
    c = jnp.arange(h, dtype=boxes.dtype)[:, None]
    x1, y1, x2, y2 = (boxes[..., i, None, None] for i in range(4))
    keep = (r >= x1) & (r < x2) & (c >= y1) & (c < y2)
    return masks * keep


def segmentation_loss(
    feats: Sequence[jnp.ndarray],
    coeffs: Sequence[jnp.ndarray],  # per-level (B, H, W, nm)
    protos: jnp.ndarray,  # (B, Hp, Wp, nm)
    batch: Dict[str, jnp.ndarray],  # + masks (B, Hm, Wm) int (overlap index)
    strides: Sequence[int],
    cfg: LossConfig,
    iou_mean: jnp.ndarray | None = None,
    max_fg: int = 64,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
    """v8SegmentationLoss: det loss + per-instance mask BCE.

    Returns (total, {box, seg, cls, dfl}, new_iou_mean); total is
    ``sum * batch_size`` like the reference.
    """
    b = feats[0].shape[0]
    hp, wp, nm = protos.shape[1:]
    total_det, comps, new_iou, aux = detection_loss(
        feats, batch, strides, cfg, iou_mean, return_aux=True
    )

    flat_coeffs = jnp.concatenate([c.reshape(b, -1, nm) for c in coeffs], axis=1)  # (B, A, nm)
    fg_mask = aux["fg_mask"]
    weight = jnp.where(fg_mask, aux["weight"], -1.0)
    _, top_idx = jax.lax.top_k(weight, max_fg)  # (B, K)
    valid = jnp.take_along_axis(fg_mask, top_idx, axis=1)  # (B, K)

    sel_coeffs = jnp.take_along_axis(flat_coeffs, top_idx[..., None], axis=1)  # (B, K, nm)
    sel_gt_idx = jnp.take_along_axis(aux["target_gt_idx"], top_idx, axis=1)  # (B, K)
    # target boxes: grid units -> pixels -> normalized -> mask pixels
    tb_px = aux["target_bboxes"] * aux["stride_tensor"][None]
    sel_boxes = jnp.take_along_axis(tb_px, top_idx[..., None], axis=1)  # (B, K, 4) px
    imgsz_h, imgsz_w = aux["imgsz"]
    norm = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], sel_boxes.dtype)
    boxes_n = sel_boxes / norm
    marea = jnp.clip((boxes_n[..., 2] - boxes_n[..., 0]) * (boxes_n[..., 3] - boxes_n[..., 1]), 1e-7, None)
    mxyxy = boxes_n * jnp.asarray([wp, hp, wp, hp], boxes_n.dtype)

    masks = batch["masks"]
    if masks.shape[1:3] != (hp, wp):  # nearest downsample (reference F.interpolate)
        masks = jax.image.resize(masks.astype(jnp.int32), (b, hp, wp), method="nearest")
    gt_masks = (masks[:, None] == (sel_gt_idx + 1)[:, :, None, None]).astype(protos.dtype)  # (B,K,Hp,Wp)

    pred_masks = jnp.einsum("bkn,bhwn->bkhw", sel_coeffs, protos.astype(sel_coeffs.dtype))
    bce = _sigmoid_bce(pred_masks, gt_masks)
    per_anchor = crop_mask(bce, mxyxy).mean(axis=(-2, -1)) / marea  # (B, K)
    n_sel = jnp.maximum(valid.sum(), 1)
    loss_seg = jnp.where(valid, per_anchor, 0.0).sum() / n_sel

    comps = dict(comps)
    comps["seg"] = loss_seg * cfg.box  # reference scales the seg term by the box gain
    total = total_det + comps["seg"] * b
    return total, comps, new_iou


def pose_loss(
    feats: Sequence[jnp.ndarray],
    kpt_maps: Sequence[jnp.ndarray],  # per-level (B, H, W, nk*nd)
    batch: Dict[str, jnp.ndarray],  # + keypoints (B, M, nk, nd) normalized
    strides: Sequence[int],
    cfg: LossConfig,
    iou_mean: jnp.ndarray | None = None,
    kpt_shape: Tuple[int, int] = (17, 3),
    pose_gain: float = 12.0,
    kobj_gain: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], jnp.ndarray]:
    """v8PoseLoss: det loss + OKS-style keypoint location + visibility BCE.

    Returns (total, {box, pose, kobj, cls, dfl}, new_iou_mean)."""
    b = feats[0].shape[0]
    nk, nd = kpt_shape
    total_det, comps, new_iou, aux = detection_loss(
        feats, batch, strides, cfg, iou_mean, return_aux=True
    )
    anchor_points = aux["anchor_points"]  # (A, 2) grid units
    stride_t = aux["stride_tensor"]  # (A, 1)
    imgsz_h, imgsz_w = aux["imgsz"]

    # decode predicted kpts in GRID units (reference v8PoseLoss.kpts_decode)
    flat = jnp.concatenate([k.reshape(b, -1, nk, nd) for k in kpt_maps], axis=1)  # (B,A,nk,nd)
    pred_xy = flat[..., :2] * 2.0 + (anchor_points[None, :, None] - 0.5)
    pred_kpts = jnp.concatenate([pred_xy, flat[..., 2:]], -1) if nd == 3 else pred_xy

    # gather gt kpts per anchor, scale px -> grid units of that anchor
    kpts = batch["keypoints"].astype(flat.dtype)  # (B, M, nk, nd) normalized
    scale_xy = jnp.asarray([imgsz_w, imgsz_h], flat.dtype)
    kpts = jnp.concatenate([kpts[..., :2] * scale_xy, kpts[..., 2:]], -1)
    sel = jnp.take_along_axis(kpts, aux["target_gt_idx"][..., None, None], axis=1)  # (B,A,nk,nd)
    sel_xy = sel[..., :2] / stride_t[None, :, None]
    kpt_mask = (sel[..., 2] != 0) if nd == 3 else jnp.ones(sel.shape[:-1], jnp.bool_)

    fg = aux["fg_mask"]  # (B, A)
    area = jnp.clip(
        (aux["target_bboxes"][..., 2] - aux["target_bboxes"][..., 0])
        * (aux["target_bboxes"][..., 3] - aux["target_bboxes"][..., 1]),
        1e-9,
        None,
    )  # (B, A) grid units
    sigmas = jnp.asarray(OKS_SIGMA if (nk, nd) == (17, 3) else np.ones(nk) / nk, flat.dtype)
    d = ((pred_xy - sel_xy) ** 2).sum(-1)  # (B, A, nk)
    e = d / (2 * sigmas[None, None]) ** 2 / (area[..., None] + 1e-9) / 2.0
    kpt_loss_factor = nk / (kpt_mask.sum(-1, keepdims=True) + 1e-9)  # (B, A, 1)
    per_el = kpt_loss_factor * (1.0 - jnp.exp(-e)) * kpt_mask
    n_fg_el = jnp.maximum(fg.sum() * nk, 1)
    loss_pose = jnp.where(fg[..., None], per_el, 0.0).sum() / n_fg_el

    if nd == 3:
        kobj = _sigmoid_bce(flat[..., 2], kpt_mask.astype(flat.dtype))
        loss_kobj = jnp.where(fg[..., None], kobj, 0.0).sum() / n_fg_el
    else:
        loss_kobj = jnp.asarray(0.0, flat.dtype)

    comps = dict(comps)
    comps["pose"] = loss_pose * pose_gain
    comps["kobj"] = loss_kobj * kobj_gain
    total = total_det + (comps["pose"] + comps["kobj"]) * b
    return total, comps, new_iou


def obb_loss(
    feats: Sequence[jnp.ndarray],
    angle_maps: Sequence[jnp.ndarray],  # per-level (B, H, W, ne)
    batch: Dict[str, jnp.ndarray],  # bboxes (B, M, 5) normalized xywh + angle rad
    strides: Sequence[int],
    cfg: LossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """v8OBBLoss: rotated assign (probiou) + probiou box loss + BCE + DFL.

    Returns (total, {box, cls, dfl})."""
    nc, reg_max = cfg.nc, cfg.reg_max
    no = nc + reg_max * 4
    b = feats[0].shape[0]
    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
    pred_distri, pred_scores = flat[..., : reg_max * 4], flat[..., reg_max * 4 :]
    dtype = pred_scores.dtype

    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]

    # decoded angle (the head's sigmoid mapping, reference OBB.forward)
    angle = jnp.concatenate([a.reshape(b, -1, a.shape[-1]) for a in angle_maps], axis=1)
    angle = (jax.nn.sigmoid(angle) - 0.25) * jnp.pi  # (B, A, ne)

    # targets: normalized xywh+r -> pixel xywhr; tiny boxes filtered into the
    # validity mask (reference filters rows with rw/rh < 2 px)
    gt = batch["bboxes"].astype(dtype)
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], dtype)
    gt_xywh = gt[..., :4] * scale
    gt_rboxes = jnp.concatenate([gt_xywh, gt[..., 4:5]], -1)  # (B, M, 5) px
    mask_gt = (
        batch["mask"].astype(jnp.bool_)
        & (gt_xywh[..., 2] >= 2)
        & (gt_xywh[..., 3] >= 2)
    )
    gt_rboxes = jnp.where(mask_gt[..., None], gt_rboxes, 0.0)
    gt_labels = batch["cls"].astype(jnp.int32)

    # decode pred rboxes (grid units)
    dist = dfl_decode(pred_distri, reg_max)
    pred_rboxes = jnp.concatenate(
        [dist2rbox(dist, angle[..., :1], anchor_points[None]), angle[..., :1]], -1
    )  # (B, A, 5)

    assigner_boxes = jax.lax.stop_gradient(
        jnp.concatenate([pred_rboxes[..., :4] * stride_tensor[None], pred_rboxes[..., 4:5]], -1)
    )
    res = tal.assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        assigner_boxes,
        anchor_points * stride_tensor,
        gt_labels,
        gt_rboxes,
        mask_gt,
        topk=cfg.tal_topk,
        num_classes=nc,
        alpha=cfg.tal_alpha,
        beta=cfg.tal_beta,
        exact_topk=cfg.exact_topk,
        rotated=True,
    )
    target_scores = jax.lax.stop_gradient(res.target_scores)
    fg_mask = res.fg_mask
    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)
    target_rboxes = jnp.concatenate(
        [res.target_bboxes[..., :4] / stride_tensor[None], res.target_bboxes[..., 4:5]], -1
    )  # grid units

    loss_cls = _sigmoid_bce(pred_scores, target_scores).sum() / target_scores_sum

    weight = jnp.where(fg_mask, target_scores.sum(-1), 0.0)
    iou = probiou(pred_rboxes, target_rboxes)
    loss_iou = (jnp.where(fg_mask, 1.0 - iou, 0.0) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], xywh2xyxy(target_rboxes[..., :4]), reg_max)
    dfl = _df_loss(pred_distri.reshape(b, -1, 4, reg_max), target_ltrb)
    loss_dfl = (jnp.where(fg_mask, dfl, 0.0) * weight).sum() / target_scores_sum

    comps = {"box": loss_iou * cfg.box, "cls": loss_cls * cfg.cls, "dfl": loss_dfl * cfg.dfl}
    total = (comps["box"] + comps["cls"] + comps["dfl"]) * b
    return total, comps
