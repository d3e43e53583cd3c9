"""Anchor-free grid machinery: make_anchors, dist2bbox/bbox2dist, DFL decode.

Rebuild of the reference's ``ultralytics/utils/tal.py:294-333``
(make_anchors / dist2bbox / bbox2dist) and the DFL expectation decode
(``nn/modules/block.py:DFL``) as pure static-shape jnp functions.

Feature maps here are NHWC; anchors are returned in (x, y) = (col, row)
order in grid units, matching the reference's convention.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_anchors(feat_shapes: Sequence[tuple], strides: Sequence[int], grid_cell_offset: float = 0.5):
    """Anchor centers and per-anchor strides for a feature pyramid.

    Args:
        feat_shapes: [(H_i, W_i), ...] per detection level (static Python ints).
        strides: per-level stride in pixels.
        grid_cell_offset: cell-center offset (0.5 = cell centers).

    Returns:
        anchor_points (A, 2) float32 in grid units (x=col, y=row);
        stride_tensor (A, 1) float32.
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True) -> jnp.ndarray:
    """Decode (l, t, r, b) distances to boxes around anchor points.

    distance: (..., A, 4); anchor_points: broadcastable (..., A, 2).
    """
    lt, rb = distance[..., :2], distance[..., 2:4]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], -1)
    return jnp.concatenate([x1y1, x2y2], -1)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Encode xyxy boxes to clamped (l, t, r, b) distances for DFL targets."""
    x1y1, x2y2 = bbox[..., :2], bbox[..., 2:4]
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], -1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def dfl_decode(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss decode: softmax-expectation over reg_max bins.

    pred_dist: (..., A, 4*reg_max) with channel layout [side, bin]
    (side-major, bin-minor — matches the reference's
    ``view(b, a, 4, reg_max)``). Returns (..., A, 4) f32 distances.

    Computed as sum(e*bins)/sum(e) with the exp in the INPUT dtype (bf16
    under AMP — half the HBM traffic of an f32 upcast on the (B, A, 64)
    train tensors) and both reductions accumulated in f32; the division
    happens on the tiny (..., 4) output, so the result matches the
    softmax-then-expectation form to fp-reassociation noise.
    """
    shape = pred_dist.shape
    dist = pred_dist.reshape(*shape[:-1], 4, reg_max)
    m = jax.lax.stop_gradient(dist.max(-1, keepdims=True))
    e = jnp.exp(dist - m)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    num = jnp.einsum("...r,r->...", e, proj, preferred_element_type=jnp.float32)
    den = e.sum(-1, dtype=jnp.float32)
    return num / den


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def dfl_decode_fused(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """:func:`dfl_decode` with an analytic VJP (identical forward math).

    Autodiff of the softmax-expectation materializes the (B, A, 4, reg_max)
    exp as a residual AND two f32 (B, A, 4, reg_max) broadcasts in the
    division backward — at DEAL-P2 b128 train shapes that is 0.55 GB saved
    + 2x 1.1 GB swept per step (HLO cost audit, docs/KERNELS.md round-3).
    The analytic form d x_r = p_r * (r - y) * dy needs only the tiny
    (B, A, 4) f32 (max, den, y) residuals plus ONE re-read of the bf16
    logits, all in a single fused elementwise pass.
    """
    return dfl_decode(pred_dist, reg_max)


def _dfl_decode_fused_fwd(pred_dist, reg_max):
    shape = pred_dist.shape
    dist = pred_dist.reshape(*shape[:-1], 4, reg_max)
    m = dist.max(-1, keepdims=True)
    e = jnp.exp(dist - m)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    num = jnp.einsum("...r,r->...", e, proj, preferred_element_type=jnp.float32)
    den = e.sum(-1, dtype=jnp.float32)
    y = num / den
    return y, (pred_dist, m, den, y)


def _dfl_decode_fused_bwd(reg_max, res, g):
    pred_dist, m, den, y = res
    shape = pred_dist.shape
    dist = pred_dist.reshape(*shape[:-1], 4, reg_max)
    p = jnp.exp((dist - m).astype(jnp.float32)) / den[..., None]
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    dx = p * (proj - y[..., None]) * g[..., None]
    return (dx.astype(pred_dist.dtype).reshape(shape),)


dfl_decode_fused.defvjp(_dfl_decode_fused_fwd, _dfl_decode_fused_bwd)


def packed_segment_matrices(reg_max: int):
    """Shared 128-lane packing constants for the packed DFL decode/loss
    (here, ops/pallas/dfl_decode.py and utils/loss._df_loss_packed — one
    definition so the XLA, Pallas and loss paths cannot diverge).

    Returns (seg, ind, bins): seg (128, 2G) with [den indicator | num
    indicator*bin] columns; ind (G, 128) group->lanes broadcast; bins
    (1, 128) per-lane bin index. G = 128 // reg_max.
    """
    groups = 128 // reg_max
    lanes = np.arange(128)
    seg = np.zeros((128, 2 * groups), np.float32)
    seg[lanes, lanes // reg_max] = 1.0
    seg[lanes, groups + lanes // reg_max] = lanes % reg_max
    ind = np.zeros((groups, 128), np.float32)
    ind[lanes // reg_max, lanes] = 1.0
    bins = (lanes % reg_max).astype(np.float32)[None, :]
    return seg, ind, bins


def dfl_decode_packed(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Lane-packed DFL decode: identical math to :func:`dfl_decode`, laid
    out for the TPU's 128-lane registers.

    The natural ``(..., 4, reg_max)`` view has a minor dim of 16, so every
    VPU tile is 7/8 padding and the einsum contracts 16-long vectors on the
    MXU. Packing ``128 // (4*reg_max)`` anchors per 128-lane row instead
    (two anchors for reg_max=16) and doing both reductions as ONE
    (rows,128)@(128,2G) segment matmul keeps every lane busy. The softmax
    max-shift is PER GROUP (like :func:`dfl_decode`): a row-global max
    would let one anchor's large logit underflow a whole neighbouring
    group to 0/0 = NaN when logit spreads exceed ~88.

    Falls back to :func:`dfl_decode` when the packing doesn't divide.
    """
    shape = pred_dist.shape
    side = 4 * reg_max
    total = 1
    for d in shape[:-1]:
        total *= d
    total *= shape[-1]
    if 128 % side != 0 or total % 128 != 0:
        return dfl_decode(pred_dist, reg_max)
    groups = 128 // reg_max  # segment groups per row (8 for reg_max=16)
    seg, _, _ = packed_segment_matrices(reg_max)
    x2 = pred_dist.reshape(-1, 128)
    mg = jax.lax.stop_gradient(
        x2.reshape(-1, groups, reg_max).max(-1, keepdims=True))
    m = jnp.broadcast_to(mg, (*mg.shape[:-1], reg_max)).reshape(-1, 128)
    e = jnp.exp(x2 - m)  # input dtype (bf16 under AMP), f32 accumulation below
    nd = jnp.dot(e, jnp.asarray(seg, e.dtype), preferred_element_type=jnp.float32)
    out = nd[:, groups:] / nd[:, :groups]
    return out.reshape(*shape[:-1], 4)


def decode_detections(feats, strides, nc: int, reg_max: int = 16,
                      packed: bool = False):
    """Full inference-path decode for a Detect head.

    Rebuild of the reference's ``Detect.forward`` inference branch
    (``nn/modules/head.py:43-77``): concat levels -> split box/cls ->
    DFL decode -> dist2bbox * stride -> sigmoid cls.

    Args:
        feats: list of (B, H_i, W_i, 4*reg_max + nc) raw head outputs (NHWC).
        strides: per-level stride.
        packed: use the 128-lane packed DFL decode (same math, full lanes).

    Returns:
        boxes (B, A, 4) xywh in input pixels; scores (B, A, nc) sigmoided.
    """
    _dfl = dfl_decode_packed if packed else dfl_decode
    b = feats[0].shape[0]
    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
    # decode PER LEVEL before concatenating: the raw (4*reg_max+nc) maps
    # never materialize as one (B, A, no) tensor, cutting HBM traffic on
    # the 8400-anchor path roughly in half (traffic-bound on TPU)
    boxes_l, cls_l = [], []
    start = 0
    for f in feats:
        h, w = f.shape[1:3]
        a = h * w
        box = f[..., : 4 * reg_max].reshape(b, a, 4 * reg_max)
        cls_l.append(f[..., 4 * reg_max:].reshape(b, a, nc))
        dist = _dfl(box, reg_max)
        ap = anchor_points[start:start + a]
        st = stride_tensor[start:start + a]
        boxes_l.append(dist2bbox(dist, ap[None], xywh=True) * st[None])
        start += a
    dbox = jnp.concatenate(boxes_l, 1)
    cls = jnp.concatenate(cls_l, 1)
    return dbox, jax.nn.sigmoid(cls)


def dist2rbox(distance, angle, anchor_points):
    """Rotated-box decode (reference tal.py:327 dist2rbox).

    distance (..., 4) ltrb in grid units; angle (..., 1) rad;
    anchor_points (..., 2). Returns (..., 4) xywh with the center offset
    rotated by the angle.
    """
    lt, rb = distance[..., :2], distance[..., 2:4]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    off = (rb - lt) / 2.0
    xf, yf = off[..., :1], off[..., 1:2]
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], -1) + anchor_points
    return jnp.concatenate([xy, lt + rb], -1)


def decode_rboxes(feats, angle, strides, nc: int, reg_max: int = 16):
    """OBB inference decode: (rboxes (B,A,5) xywhr px, scores (B,A,nc)).

    Rebuild of the reference OBB.forward inference branch (head.py:116):
    DFL -> dist2rbox with the sigmoid-mapped angle -> *stride; the angle is
    NOT scaled by stride. Decodes PER LEVEL before concatenating, like
    :func:`decode_detections` — the raw (4*reg_max+nc) maps never
    materialize as one (B, A, no) tensor (HBM-traffic bound on TPU).
    """
    b = feats[0].shape[0]
    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_tensor = make_anchors(feat_shapes, strides, 0.5)
    rbox_l, cls_l = [], []
    start = 0
    for f in feats:
        h, w = f.shape[1:3]
        a = h * w
        box = f[..., : 4 * reg_max].reshape(b, a, 4 * reg_max)
        cls_l.append(f[..., 4 * reg_max:].reshape(b, a, nc))
        dist = dfl_decode(box, reg_max)
        ang = angle[:, start:start + a]
        ap = anchor_points[start:start + a]
        st = stride_tensor[start:start + a]
        rbox_l.append(dist2rbox(dist, ang, ap[None]) * st[None])
        start += a
    rbox = jnp.concatenate(rbox_l, 1)
    cls = jnp.concatenate(cls_l, 1)
    return jnp.concatenate([rbox, angle], -1), jax.nn.sigmoid(cls)
