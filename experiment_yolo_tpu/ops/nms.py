"""Static-shape, on-device non-maximum suppression.

TPU-native redesign of the reference's ``ultralytics/utils/ops.py:292``
(``non_max_suppression``: conf gate -> class-offset trick ->
``torchvision.ops.nms``). TorchVision NMS is dynamic-shape and runs on
device-specific C++; here the whole thing is a fixed-size XLA program:

1. top-K candidate pre-selection over the (anchors x classes) score matrix
   (multi-label, like the reference's validator path) or over per-anchor
   best class (predictor path),
2. greedy suppression over the K x K IoU matrix via ``lax.fori_loop``
   (class-offset trick preserves per-class semantics),
3. fixed (max_det, 6) output [x1, y1, x2, y2, conf, cls] plus a valid count.

No host round-trip, no dynamic shapes, vmappable over the batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.ops.boxes import box_iou, xywh2xyxy


def _nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    pre_nms_topk: int,
    multi_label: bool,
    agnostic: bool,
    max_wh: float,
    in_xywh: bool,
    use_pallas: bool,
    nms_type: str,
    sigma: float,
    score_threshold: float,
    soft_first_quirk: bool,
):
    """NMS for one image. boxes (A,4), scores (A,nc). Returns ((max_det,6), n)."""
    # NMS always runs f32: bf16 scores (AMP models) break score ordering
    # (ties at 3 decimal digits) and the soft-NMS decay loop's carry dtype.
    boxes, scores = boxes.astype(jnp.float32), scores.astype(jnp.float32)
    if in_xywh:
        boxes = xywh2xyxy(boxes)
    a = boxes.shape[0]
    k = min(pre_nms_topk, a * scores.shape[-1] if multi_label else a)

    quirk = nms_type == "soft" and soft_first_quirk
    first_idx = n_valid = None
    if multi_label:
        a_, nc_ = scores.shape
        flat = scores.reshape(-1)
        cand_scores, top_idx = jax.lax.top_k(flat, k)
        if quirk:
            # reference soft_nms keeps its first box in x-array order — the
            # lowest (anchor, class) flat index among conf-passing candidates
            # (ops.py:262: order=arange is never score-sorted for
            # n <= max_nms). At val conf 0.001 that candidate may fall
            # outside our top-k pool: force-include it in the last slot.
            vfirst = flat > conf_thres
            n_valid = jnp.sum(vfirst, dtype=jnp.int32)
            first_flat = jnp.argmax(vfirst)
            present = jnp.any(top_idx == first_flat)
            last = k - 1
            top_idx = top_idx.at[last].set(jnp.where(present, top_idx[last], first_flat))
            cand_scores = cand_scores.at[last].set(
                jnp.where(present, cand_scores[last], flat[first_flat]))
            first_idx = jnp.argmax(top_idx == first_flat)
        cand_anchor = top_idx // nc_
        cand_cls = (top_idx % nc_).astype(jnp.float32)
        cand_boxes = boxes[cand_anchor]
    else:
        best_scores = scores.max(-1)
        best_cls = scores.argmax(-1).astype(jnp.float32)
        cand_scores, cand_anchor = jax.lax.top_k(best_scores, k)
        if quirk:
            vfirst = best_scores > conf_thres
            n_valid = jnp.sum(vfirst, dtype=jnp.int32)
            first_anchor = jnp.argmax(vfirst)
            present = jnp.any(cand_anchor == first_anchor)
            last = k - 1
            cand_anchor = cand_anchor.at[last].set(
                jnp.where(present, cand_anchor[last], first_anchor))
            cand_scores = cand_scores.at[last].set(
                jnp.where(present, cand_scores[last], best_scores[first_anchor]))
            first_idx = jnp.argmax(cand_anchor == first_anchor)
        cand_boxes, cand_cls = boxes[cand_anchor], best_cls[cand_anchor]

    valid = cand_scores > conf_thres
    # class-offset trick: shift boxes per class so cross-class IoU is ~0
    offset = jnp.where(agnostic, 0.0, cand_cls * max_wh)[:, None]
    shifted = cand_boxes + offset

    if nms_type == "soft":
        keep_scores = _soft_nms_keep(shifted, cand_scores, valid, iou_thres, sigma, score_threshold,
                                     max_det, first_idx=first_idx, n_valid=n_valid)
        return _pack(cand_boxes, cand_cls, cand_anchor, keep_scores, conf_thres, max_det, k)
    if use_pallas:
        # fused VMEM suppression kernel: no (K, K) HBM intermediate
        from experiment_yolo_tpu.ops.pallas.nms_kernel import nms_suppress

        keep = nms_suppress(shifted, valid, iou_thres)
    else:
        iou = box_iou(shifted, shifted)  # (K, K)

        # Greedy suppression: candidates are already score-sorted (top_k
        # sorts descending). keep[i] survives unless an earlier kept box
        # overlaps it.
        def body(i, keep):
            suppress = (iou[i] > iou_thres) & keep[i] & valid[i]
            suppress = suppress.at[i].set(False)
            # only suppress lower-scored (later) candidates
            later = jnp.arange(k) > i
            return keep & ~(suppress & later)

        keep = jax.lax.fori_loop(0, k, body, valid)

    # pack kept detections into fixed (max_det, 6), score-sorted
    keep_scores = jnp.where(keep, cand_scores, -1.0)
    return _pack(cand_boxes, cand_cls, cand_anchor, keep_scores, conf_thres, max_det, k)


def _soft_nms_keep(shifted, cand_scores, valid, iou_thres, sigma, score_threshold, max_det,
                   first_idx=None, n_valid=None):
    """Gaussian soft-NMS (reference ops.py:260 ``soft_nms`` — the DEAL fork
    REPLACES torchvision hard NMS with this in its whole predict/val
    protocol, ops.py:115-116): pick the best remaining box, Gaussian-decay
    (exp(-iou^2/sigma)) every remaining score whose IoU exceeds iou_thres,
    stop when the best remaining decayed score falls below the hard
    ``score_threshold`` (0.25 by default REGARDLESS of conf_thres — the
    fork never overrides it).

    Returns per-candidate output scores (decayed, matching the reference's
    in-place ``x[:, 4]`` mutation) with non-kept candidates at -1.

    Quirk mode (``first_idx``/``n_valid`` set) replicates two more
    reference behaviors exactly (verified empirically against ops.py:260):
    - the FIRST kept box is in array (anchor) order, kept unconditionally
      (ops.py:270 appends order[0] before any threshold check — even below
      the 0.25 floor, which matters at val conf 0.001);
    - ``while order.numel() > 1`` means a keep only happens when at least
      TWO candidates remain, so the last lone survivor is always DROPPED
      (the inner ``numel()==1`` branch is dead code).
    Default mode (no quirk) keeps strictly by score with no lone-survivor
    drop — the cleaned-up protocol.
    """
    k = shifted.shape[0]
    live = jnp.where(valid, cand_scores, -1.0)

    def body(_t, state):
        live, out = state
        i = jnp.argmax(live)
        si = live[i]
        if first_idx is not None:
            # survivors of the previous round (> 0.25); at t=0 the reference
            # has not filtered yet, so the count is all conf-passing boxes
            surv = jnp.sum(live > score_threshold, dtype=jnp.int32)
            m = jnp.where(_t == 0, n_valid, surv)
            i = jnp.where(_t == 0, first_idx, i)
            si = live[i]
            cond = m >= 2
        else:
            cond = si > score_threshold
        iou = box_iou(shifted[i][None], shifted)[0]
        decay = jnp.where(iou > iou_thres, jnp.exp(-(iou**2) / sigma), 1.0)
        new_live = jnp.where(cond, live * decay, live).at[i].set(-1.0)
        new_out = jnp.where(cond, out.at[i].set(si), out)
        return new_live, jnp.where(cond, new_out, out)

    _, out_scores = jax.lax.fori_loop(0, min(max_det, k), body, (live, jnp.full((k,), -1.0)))
    return out_scores


def _pack(cand_boxes, cand_cls, cand_anchor, keep_scores, conf_thres, max_det, k):
    out_scores, out_idx = jax.lax.top_k(keep_scores, min(max_det, k))
    if k < max_det:  # pad to the fixed output size
        pad = max_det - k
        out_scores = jnp.concatenate([out_scores, jnp.full((pad,), -1.0, out_scores.dtype)])
        out_idx = jnp.concatenate([out_idx, jnp.zeros((pad,), out_idx.dtype)])
    det_valid = out_scores > conf_thres
    out = jnp.concatenate(
        [
            cand_boxes[out_idx],
            out_scores[:, None],
            cand_cls[out_idx][:, None],
        ],
        axis=-1,
    )
    out = jnp.where(det_valid[:, None], out, 0.0)
    anchor_idx = jnp.where(det_valid, cand_anchor[out_idx], 0).astype(jnp.int32)
    return out, det_valid.sum(dtype=jnp.int32), anchor_idx


@partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "pre_nms_topk", "multi_label", "agnostic", "max_wh", "in_xywh", "use_pallas", "return_idx", "nms_type", "sigma", "score_threshold", "soft_first_quirk"),
)
def non_max_suppression(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    multi_label: bool = False,
    agnostic: bool = False,
    max_wh: float = 7680.0,
    in_xywh: bool = True,
    use_pallas: bool = False,
    return_idx: bool = False,
    nms_type: str = "hard",
    sigma: float = 0.5,
    score_threshold: float = 0.25,
    soft_first_quirk: bool = False,
):
    """Batched static-shape NMS.

    ``nms_type='soft'`` runs the reference fork's Gaussian soft-NMS
    (ops.py:260, the protocol its val/predict numbers are produced with);
    'hard' is classic greedy suppression.

    Args:
        boxes: (B, A, 4) xywh (or xyxy with in_xywh=False) in input pixels.
        scores: (B, A, nc) sigmoided class scores.

    Returns:
        detections (B, max_det, 6) [x1,y1,x2,y2,conf,cls], zero-padded;
        counts (B,) int32 number of valid detections per image;
        [+ anchor indices (B, max_det) int32 when return_idx — used by the
        seg/pose paths to gather per-anchor mask coeffs / keypoints].
    """
    fn = partial(
        _nms_single,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        pre_nms_topk=pre_nms_topk,
        multi_label=multi_label,
        agnostic=agnostic,
        max_wh=max_wh,
        in_xywh=in_xywh,
        use_pallas=use_pallas,
        nms_type=nms_type,
        sigma=sigma,
        score_threshold=score_threshold,
        soft_first_quirk=soft_first_quirk,
    )
    out, counts, idx = jax.vmap(fn)(boxes, scores)
    return (out, counts, idx) if return_idx else (out, counts)


def _nms_rotated_single(rboxes, scores, conf_thres, iou_thres, max_det, pre_nms_topk, max_wh):
    """Rotated NMS for one image (reference ops.py:nms_rotated — greedy
    suppression on the probiou matrix). rboxes (A, 5) xywhr; scores (A, nc)."""
    from experiment_yolo_tpu.ops.boxes import probiou

    a = rboxes.shape[0]
    k = min(pre_nms_topk, a)
    best_scores = scores.max(-1)
    best_cls = scores.argmax(-1).astype(jnp.float32)
    cand_scores, cand_anchor = jax.lax.top_k(best_scores, k)
    cand_boxes, cand_cls = rboxes[cand_anchor], best_cls[cand_anchor]
    valid = cand_scores > conf_thres

    # class-offset trick on the centers (cross-class probiou ~ 0)
    off = cand_cls[:, None] * max_wh
    shifted = jnp.concatenate([cand_boxes[:, :2] + off, cand_boxes[:, 2:]], -1)
    iou = probiou(shifted[:, None], shifted[None])  # (K, K)

    def body(i, keep):
        suppress = (iou[i] > iou_thres) & keep[i] & valid[i]
        suppress = suppress.at[i].set(False)
        later = jnp.arange(k) > i
        return keep & ~(suppress & later)

    keep = jax.lax.fori_loop(0, k, body, valid)
    keep_scores = jnp.where(keep, cand_scores, -1.0)
    out_scores, out_idx = jax.lax.top_k(keep_scores, min(max_det, k))
    if k < max_det:
        pad = max_det - k
        out_scores = jnp.concatenate([out_scores, jnp.full((pad,), -1.0, out_scores.dtype)])
        out_idx = jnp.concatenate([out_idx, jnp.zeros((pad,), out_idx.dtype)])
    det_valid = out_scores > conf_thres
    out = jnp.concatenate(
        [cand_boxes[out_idx], out_scores[:, None], cand_cls[out_idx][:, None]], -1
    )  # (max_det, 7): xywhr + conf + cls
    out = jnp.where(det_valid[:, None], out, 0.0)
    return out, det_valid.sum(dtype=jnp.int32)


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_nms_topk", "max_wh"))
def nms_rotated(
    rboxes: jnp.ndarray,
    scores: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    pre_nms_topk: int = 1024,
    max_wh: float = 7680.0,
):
    """Batched rotated-box NMS: (B, A, 5) xywhr + (B, A, nc) ->
    ((B, max_det, 7) [xywhr, conf, cls], counts)."""
    fn = partial(
        _nms_rotated_single,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        pre_nms_topk=pre_nms_topk,
        max_wh=max_wh,
    )
    return jax.vmap(fn)(rboxes, scores)
