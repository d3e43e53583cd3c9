"""Task-Aligned Assigner — static-shape JAX rebuild.

Counterpart of the reference's ``ultralytics/utils/tal.py:13-259``
(``TaskAlignedAssigner``). The torch original relies on boolean indexing and
data-dependent branches (``if fg_mask.max() > 1``); here everything is a
fixed-shape masked computation so it traces into one XLA program:

- gt boxes arrive padded to a fixed ``max_boxes`` with a validity mask;
- top-k selection uses ``lax.top_k`` + one-hot scatter counting, with the
  reference's duplicate-index quirk reproduced (duplicated indices are
  dropped entirely, including the masked-to-0 rows);
- the multi-gt anchor resolution always runs (it is a no-op when no anchor
  is shared).

The whole assigner runs under ``stop_gradient`` semantics by construction
(callers pass detached predictions, as the reference does).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (B, A) int32
    target_bboxes: jnp.ndarray  # (B, A, 4)
    target_scores: jnp.ndarray  # (B, A, nc)
    fg_mask: jnp.ndarray  # (B, A) bool
    target_gt_idx: jnp.ndarray  # (B, A) int32


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Anchor centers strictly inside gt boxes: (A,2) x (B,M,4) -> (B,M,A).

    Four fused comparisons instead of the reference's concat+amin over a
    (B, M, A, 4) delta tensor (tal.py:17 ``bbox_deltas.amin(3)``) — the
    concat materialized 1.1 GB f32 at DEAL-P2 b128 shapes."""
    x = xy_centers[None, None, :, 0]
    y = xy_centers[None, None, :, 1]
    x1, y1 = gt_bboxes[..., None, 0], gt_bboxes[..., None, 1]
    x2, y2 = gt_bboxes[..., None, 2], gt_bboxes[..., None, 3]
    return (x - x1 > eps) & (y - y1 > eps) & (x2 - x > eps) & (y2 - y > eps)


def select_candidates_in_rotated_gts(xy_centers: jnp.ndarray, gt_rboxes: jnp.ndarray) -> jnp.ndarray:
    """Anchor centers inside rotated gt boxes: (A,2) x (B,M,5 xywhr) -> (B,M,A).

    Reference RotatedTaskAlignedAssigner.select_candidates_in_gts
    (tal.py:266): project the center onto the box edge vectors."""
    from experiment_yolo_tpu.ops.boxes import xywhr2xyxyxyxy

    corners = xywhr2xyxyxyxy(gt_rboxes)  # (B, M, 4, 2)
    a, b_, d = corners[..., 0, :], corners[..., 1, :], corners[..., 3, :]
    ab = (b_ - a)[..., None, :]  # (B, M, 1, 2)
    ad = (d - a)[..., None, :]
    ap = xy_centers[None, None] - a[..., None, :]  # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1)
    norm_ad = (ad * ad).sum(-1)
    ap_ab = (ap * ab).sum(-1)
    ap_ad = (ap * ad).sum(-1)
    return (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)


def _select_topk_mask(metrics: jnp.ndarray, topk: int, valid_gt: jnp.ndarray,
                      exact: bool = False) -> jnp.ndarray:
    """Top-k per gt as a (B, M, A) 0/1 mask, reproducing the reference's
    scatter-count semantics. top_k returns distinct indices per row, so the
    reference's duplicate-drop only ever fires on INVALID gt rows (whose
    indices are all forced to 0) — a row-zero instead. Scatter builds the
    mask directly; the old one_hot(idx, A).sum formed a (B, M, k, A) int
    intermediate (~8 GB at DEAL-P2 shapes, 60+ ms of the train step)."""
    b, m, a = metrics.shape
    if exact:
        _, topk_idx = jax.lax.top_k(metrics, topk)  # (B, M, topk)
    else:
        # TPU-optimized partial-reduction top-k: ~15x faster than the full
        # sort at A=34k (64 ms -> 4.4 ms measured); recall 0.99 can swap a
        # borderline ~10th-ranked candidate for the ~11th, which is noise
        # at TAL's heuristic margin. exact=True restores the sort for
        # reference-parity runs.
        _, topk_idx = jax.lax.approx_max_k(metrics, topk, recall_target=0.99)
    bi = jnp.arange(b)[:, None, None]
    mi = jnp.arange(m)[None, :, None]
    mask = jnp.zeros((b, m, a), metrics.dtype).at[bi, mi, topk_idx].set(1.0)
    return mask * valid_gt[..., None].astype(metrics.dtype)


@partial(jax.jit, static_argnames=("topk", "num_classes", "alpha", "beta", "rotated", "exact_topk"))
def assign(
    pd_scores: jnp.ndarray,  # (B, A, nc) sigmoided
    pd_bboxes: jnp.ndarray,  # (B, A, 4) xyxy px (rotated: (B, A, 5) xywhr px)
    anc_points: jnp.ndarray,  # (A, 2) pixel units
    gt_labels: jnp.ndarray,  # (B, M) int
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy px (rotated: (B, M, 5) xywhr; zero rows = padding)
    mask_gt: jnp.ndarray,  # (B, M) bool
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    rotated: bool = False,
    exact_topk: bool = False,
) -> AssignResult:
    """Task-aligned assignment (s^alpha * u^beta), static shapes throughout.

    ``rotated=True`` is the RotatedTaskAlignedAssigner (reference
    tal.py:261): xywhr boxes, probiou overlaps, point-in-rotated-rect
    candidate test."""
    b, a, nc = pd_scores.shape
    m = gt_bboxes.shape[1]
    gt_labels = gt_labels.astype(jnp.int32)
    mask_gt = mask_gt.astype(jnp.bool_)

    # --- positive-candidate mask -----------------------------------------
    if rotated:
        mask_in_gts = select_candidates_in_rotated_gts(anc_points, gt_bboxes)
    else:
        mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # (B,M,A)
    pre_mask = mask_in_gts & mask_gt[..., None]

    # scores of each anchor for each gt's class: (B, M, A). One-hot einsum
    # (an MXU matmul reading pd_scores once) instead of transpose +
    # take_along_axis: the physical (B, A, nc) -> (B, nc, A) transpose alone
    # moves 2x the score tensor through HBM (688 MB f32 at DEAL-P2 shapes).
    # Exact: one nonzero per row, no accumulation.
    # precision=highest: at default precision TPU dots run bf16 passes,
    # which would truncate f32 scores (parity / amp-off runs) before the
    # one-hot selection; bf16 AMP inputs are unaffected either way.
    label_oh = jax.nn.one_hot(jnp.clip(gt_labels, 0, nc - 1), nc, dtype=pd_scores.dtype)
    cls_scores = jnp.einsum(
        "bmc,bac->bma", label_oh, pd_scores, precision=jax.lax.Precision.HIGHEST
    )
    if rotated:
        from experiment_yolo_tpu.ops.boxes import probiou

        overlaps = probiou(gt_bboxes[:, :, None], pd_bboxes[:, None])
    else:
        overlaps = bbox_iou(gt_bboxes[:, :, None], pd_bboxes[:, None], xywh=False, CIoU=True)[..., 0]
    overlaps = jnp.clip(jnp.where(pre_mask, overlaps, 0.0), 0.0, None)
    cls_scores = jnp.where(pre_mask, cls_scores, 0.0)
    align_metric = cls_scores**alpha * overlaps**beta

    mask_topk = _select_topk_mask(align_metric, topk, mask_gt, exact=exact_topk)
    mask_pos = mask_topk * pre_mask.astype(align_metric.dtype)  # (B, M, A)

    # --- resolve anchors claimed by several gts (highest CIoU wins) ------
    fg_counts = mask_pos.sum(-2)  # (B, A)
    mask_multi = (fg_counts[:, None, :] > 1)
    max_overlap_gt = overlaps.argmax(1)  # (B, A)
    mi = jnp.arange(m)[None, :, None]
    # compare-iota instead of one_hot(...).transpose: the physical (B, A, M)
    # -> (B, M, A) transpose was a layout copy; the comparison fuses.
    is_max = (mi == max_overlap_gt[:, None, :]).astype(mask_pos.dtype)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask_f = mask_pos.sum(-2)  # (B, A)
    fg_mask = fg_mask_f > 0
    target_gt_idx = mask_pos.argmax(-2).astype(jnp.int32)  # (B, A)

    # --- gather targets ---------------------------------------------------
    # One-hot-over-M contraction, NOT take_along_axis: XLA lowers the
    # per-element (B, A)-from-(B, M) gather to a scalar-indexed loop on TPU
    # — measured 63 ms of the DEAL-P2 b128 train step for these two lines,
    # vs ~1 ms for the fused compare-iota select / tiny-M einsum.
    oh_gt = mi == target_gt_idx[:, None, :]  # (B, M, A), exactly one hit per anchor
    target_labels = jnp.where(oh_gt, gt_labels[:, :, None], 0).sum(1)  # (B, A)
    # masked select + sum, NOT an einsum: a dot_general at default matmul
    # precision runs bf16 passes on TPU, which would quantize the f32 gt
    # pixel coordinates (ulp 2-4 px at 320-640); adding 15 exact zeros is
    # exact, and the fused broadcast+reduce reads only oh_gt + gt_bboxes
    target_bboxes = jnp.where(
        oh_gt[..., None], gt_bboxes[:, :, None, :], 0.0
    ).sum(1)  # (B, A, 4|5)
    target_labels = jnp.clip(target_labels, 0, None)
    onehot = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = jnp.where(fg_mask[..., None], onehot, 0.0)

    # --- normalize by per-gt best metric (reference forward:82-88) -------
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)  # (B, M, 1)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(-2)[..., None]  # (B, A, 1)
    # keep target_scores in the score dtype (bf16 under AMP): norm is in
    # [0, 1] and the product would otherwise promote the (B, A, nc) tensor
    target_scores = target_scores * norm.astype(target_scores.dtype)

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)
