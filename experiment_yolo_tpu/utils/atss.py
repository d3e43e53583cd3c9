"""ATSS assigner — static-shape JAX rebuild.

Counterpart of the reference's ``ultralytics/utils/atss.py:396``
(``ATSSAssigner`` + ``generate_anchors:52``): per-level top-k candidates by
center distance, adaptive IoU threshold (mean + std over candidates),
center-in-gt constraint, highest-IoU multi-gt resolution, one-hot targets
soft-labeled by the max predicted IoU per gt.

All masked fixed-shape computation, jittable; shares ``AssignResult`` with
the TAL assigner so the loss can switch assigners via config.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.ops.boxes import box_iou
from experiment_yolo_tpu.utils.tal import AssignResult, select_candidates_in_gts

GRID_CELL_SIZE = 5.0  # anchor box = 5 x stride around the cell center (atss.py:52)


def anchor_boxes_from_points(anc_points: jnp.ndarray, stride_tensor: jnp.ndarray) -> jnp.ndarray:
    """(A,2) centers + (A,1) strides -> (A,4) xyxy cell anchor boxes."""
    half = stride_tensor * GRID_CELL_SIZE * 0.5
    return jnp.concatenate([anc_points - half, anc_points + half], axis=-1)


@partial(jax.jit, static_argnames=("feat_shapes", "level_strides", "topk", "num_classes"))
def assign(
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy pixels (decoded predictions)
    anc_points: jnp.ndarray,  # (A, 2) pixel centers
    stride_tensor: jnp.ndarray,  # (A, 1)
    feat_shapes,  # tuple of (H, W) per level (static)
    level_strides,  # tuple of strides (static)
    gt_labels: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy pixels
    mask_gt: jnp.ndarray,  # (B, M) bool
    topk: int = 9,
    num_classes: int = 80,
    eps: float = 1e-9,
) -> AssignResult:
    b, m = gt_labels.shape
    a = anc_points.shape[0]
    feat_shapes = tuple(tuple(s) for s in feat_shapes)
    n_level = [h * w for (h, w) in feat_shapes]
    mask_gt = mask_gt.astype(jnp.bool_)
    gt_labels = gt_labels.astype(jnp.int32)

    anc_bboxes = anchor_boxes_from_points(anc_points, stride_tensor)  # (A, 4)
    overlaps = box_iou(gt_bboxes.reshape(-1, 4), anc_bboxes).reshape(b, m, a)

    gt_centers = (gt_bboxes[..., :2] + gt_bboxes[..., 2:4]) / 2  # (B, M, 2)
    dist = jnp.linalg.norm(gt_centers[:, :, None] - anc_points[None, None], axis=-1)  # (B,M,A)

    # per-level top-k closest anchors (candidate mask, duplicates dropped)
    cand_masks = []
    start = 0
    for n in n_level:
        d = dist[..., start : start + n]
        k = min(topk, n)
        _, idx = jax.lax.top_k(-d, k)  # smallest distances
        idx = jnp.where(mask_gt[..., None], idx, 0)
        count = jax.nn.one_hot(idx, n, dtype=jnp.int32).sum(-2)
        cand_masks.append(jnp.where(count > 1, 0, count))
        start += n
    is_in_candidate = jnp.concatenate(cand_masks, axis=-1).astype(overlaps.dtype)  # (B,M,A)

    # adaptive threshold: mean + std of candidate IoUs per gt, computed over
    # exactly k*len(levels) candidate slots (reference gathers by index; here
    # masked moments over the fixed candidate count)
    cand_overlaps = jnp.where(is_in_candidate > 0, overlaps, 0.0)
    n_cand = sum(min(topk, n) for n in n_level)
    mean = cand_overlaps.sum(-1, keepdims=True) / n_cand
    var = jnp.where(is_in_candidate > 0, (overlaps - mean) ** 2, 0.0).sum(-1, keepdims=True) / max(n_cand - 1, 1)
    thr = mean + jnp.sqrt(var)

    is_pos = jnp.where(cand_overlaps > thr, is_in_candidate, 0.0)
    is_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
    mask_pos = is_pos * is_in_gts.astype(is_pos.dtype) * mask_gt[..., None].astype(is_pos.dtype)

    # resolve multi-gt anchors by highest IoU (same as TAL); compare-iota +
    # tiny-M contraction instead of one_hot().transpose / take_along_axis —
    # the per-element gather lowers to a scalar loop on TPU (see tal.py)
    fg_counts = mask_pos.sum(-2)
    mask_multi = fg_counts[:, None, :] > 1
    mi = jnp.arange(m)[None, :, None]
    is_max = (mi == overlaps.argmax(1)[:, None, :]).astype(mask_pos.dtype)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2) > 0
    target_gt_idx = mask_pos.argmax(-2).astype(jnp.int32)

    oh_gt = mi == target_gt_idx[:, None, :]  # (B, M, A)
    target_labels = jnp.where(oh_gt, gt_labels[:, :, None], 0).sum(1)
    # masked select+sum, not einsum: default-precision dots truncate the f32
    # gt pixel coordinates to bf16 on TPU (see tal.py)
    target_bboxes = jnp.where(oh_gt[..., None], gt_bboxes[:, :, None, :], 0.0).sum(1)
    onehot = jax.nn.one_hot(jnp.clip(target_labels, 0, None), num_classes, dtype=pd_bboxes.dtype)
    target_scores = jnp.where(fg_mask[..., None], onehot, 0.0)

    # soft label: scale by the max predicted IoU per gt (atss.py:forward tail)
    pred_ious = _pairwise_per_batch(gt_bboxes, pd_bboxes)  # (B, M, A)
    ious = (pred_ious * mask_pos).max(-2)[..., None]
    target_scores = target_scores * ious

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)


def _pairwise_per_batch(gt_bboxes, pd_bboxes):
    """(B,M,4) x (B,A,4) -> (B,M,A) IoU."""
    return jax.vmap(box_iou)(gt_bboxes, pd_bboxes)
