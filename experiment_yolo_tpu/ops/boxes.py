"""Box geometry: format conversions, IoU family, NWD, Wise-IoU focusing.

TPU-native rebuild of the box math in the reference's
``ultralytics/utils/ops.py`` (xywh2xyxy &co) and
``ultralytics/utils/metrics.py:75-741`` (bbox_iou variants,
wasserstein_loss, WiseIouLoss). Everything here is pure jnp, static-shape,
batched over arbitrary leading dims, and differentiable.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# format conversions (reference: ultralytics/utils/ops.py:403-500)
# ---------------------------------------------------------------------------

def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    p1, p2 = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(p1 + p2) * 0.5, p2 - p1], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float, h: float, padw: float = 0.0, padh: float = 0.0) -> jnp.ndarray:
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2) with optional pad shift."""
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    pad = jnp.asarray([padw, padh, padw, padh], dtype=x.dtype)
    return xywh2xyxy(x * scale) + pad


def xyxy2xywhn(x: jnp.ndarray, w: float, h: float, eps: float = 0.0) -> jnp.ndarray:
    scale = jnp.asarray([w, h, w, h], dtype=x.dtype)
    return xyxy2xywh(x) / (scale + eps)


def clip_boxes(boxes: jnp.ndarray, h: float, w: float) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (reference: ops.py:clip_boxes)."""
    lo = jnp.zeros((4,), boxes.dtype)
    hi = jnp.asarray([w, h, w, h], boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def scale_boxes(boxes: jnp.ndarray, from_shape, to_shape, ratio_pad=None) -> jnp.ndarray:
    """Rescale xyxy boxes from letterboxed `from_shape` (h,w) back to `to_shape`.

    Reference: ultralytics/utils/ops.py:scale_boxes (gain/pad arithmetic).
    """
    if ratio_pad is None:
        gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
        padw = round((from_shape[1] - to_shape[1] * gain) / 2 - 0.1)
        padh = round((from_shape[0] - to_shape[0] * gain) / 2 - 0.1)
    else:
        gain, (padw, padh) = ratio_pad[0], ratio_pad[1]
    shift = jnp.asarray([padw, padh, padw, padh], boxes.dtype)
    return clip_boxes((boxes - shift) / gain, to_shape[0], to_shape[1])


# ---------------------------------------------------------------------------
# IoU family (reference: metrics.py:181-260 bbox_iou, :747 box_iou)
# ---------------------------------------------------------------------------

def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU of two xyxy box sets: (N,4) x (M,4) -> (N,M)."""
    a1, a2 = jnp.split(box1[..., :, None, :], 2, axis=-1)  # (N,1,2) each
    b1, b2 = jnp.split(box2[..., None, :, :], 2, axis=-1)  # (1,M,2) each
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = jnp.clip(a2 - a1, 0, None).prod(-1)
    area2 = jnp.clip(b2 - b1, 0, None).prod(-1)
    return inter / (area1 + area2 - inter + eps)


def get_inner_iou(box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = True, ratio: float = 0.7, eps: float = 1e-7) -> jnp.ndarray:
    """Inner-IoU: IoU of ratio-shrunk boxes (reference metrics.py:189,
    arXiv:2311.02877). Returns (..., 1)."""
    if not xywh:
        box1, box2 = xyxy2xywh(box1), xyxy2xywh(box2)
    (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
    (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
    b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1 * ratio / 2, x1 + w1 * ratio / 2, y1 - h1 * ratio / 2, y1 + h1 * ratio / 2
    b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2 * ratio / 2, x2 + w2 * ratio / 2, y2 - h2 * ratio / 2, y2 + h2 * ratio / 2
    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 * ratio * ratio + w2 * h2 * ratio * ratio - inter + eps
    return inter / union


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    EIoU: bool = False,
    SIoU: bool = False,
    ShapeIoU: bool = False,
    PIoU: bool = False,
    PIoU2: bool = False,
    MPDIoU: bool = False,
    inner: bool = False,
    focaler: bool = False,
    ratio: float = 0.7,
    d: float = 0.0,
    u: float = 0.95,
    scale: float = 0.0,
    Lambda: float = 1.3,
    mpdiou_hw=None,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise IoU with the full reference variant zoo
    (metrics.py:75-539): G/D/C/E/S/Shape/P/P2/MPD IoU, each composable with
    the Inner (ratio-shrunk boxes, bbox_inner_iou) and Focaler
    (interval-remapped iou, bbox_focaler_iou) transforms.

    box1, box2: broadcastable (..., 4). Returns (..., 1) like the reference
    (metrics.py:181 keeps a trailing dim via chunk(4, -1)).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, -1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    iou_for_alpha = iou  # the inner variant's CIoU alpha keeps the PLAIN iou
    if inner:  # Inner-IoU replaces the base term (bbox_inner_iou)
        iou = get_inner_iou(box1, box2, xywh=xywh, ratio=ratio, eps=eps)
    elif focaler:  # Focaler-IoU remaps the base term (bbox_focaler_iou);
        # the remap happens BEFORE the penalties, so alpha sees it too
        iou = jnp.clip((iou - d) / (u - d), 0.0, 1.0)
        iou_for_alpha = iou

    if MPDIoU:
        # minimum-point-distance IoU (metrics.py:446): corner distances
        # normalized by the image diagonal^2 mpdiou_hw
        hw = mpdiou_hw if mpdiou_hw is not None else 1.0
        d1 = (b2_x1 - b1_x1) ** 2 + (b2_y1 - b1_y1) ** 2
        d2 = (b2_x2 - b1_x2) ** 2 + (b2_y2 - b1_y2) ** 2
        return iou - d1 / hw - d2 / hw

    if not (GIoU or DIoU or CIoU or EIoU or SIoU or ShapeIoU or PIoU or PIoU2):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height
    if GIoU:
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area

    c2 = cw**2 + ch**2 + eps  # convex diagonal squared
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    if DIoU:
        return iou - rho2 / c2
    if CIoU:
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou_for_alpha + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    if EIoU:
        rho_w2 = (w2 - w1) ** 2
        rho_h2 = (h2 - h1) ** 2
        return iou - (rho2 / c2 + rho_w2 / (cw**2 + eps) + rho_h2 / (ch**2 + eps))
    if SIoU:
        # SIoU (SCYLLA-IoU, arXiv:2205.12740; reference metrics.py SIoU branch)
        s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5 + eps
        s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5 + eps
        sigma = jnp.sqrt(s_cw**2 + s_ch**2) + eps
        sin_a, sin_b = jnp.abs(s_cw) / sigma, jnp.abs(s_ch) / sigma
        threshold = math.sqrt(2) / 2
        sin_best = jnp.where(sin_a > threshold, sin_b, sin_a)
        angle_cost = jnp.cos(jnp.arcsin(jnp.clip(sin_best, -1 + eps, 1 - eps)) * 2 - math.pi / 2)
        rho_x = (s_cw / (cw + eps)) ** 2
        rho_y = (s_ch / (ch + eps)) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        return iou - 0.5 * (distance_cost + shape_cost)
    if ShapeIoU:
        # Shape-IoU (metrics.py ShapeIoU branch, arXiv:2312.17663):
        # target-shape-weighted center distance + shape cost
        ww = 2 * w2**scale / (w2**scale + h2**scale)
        hh = 2 * h2**scale / (w2**scale + h2**scale)
        cdx = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2) / 4
        cdy = ((b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        distance = (hh * cdx + ww * cdy) / c2
        omiga_w = hh * jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = ww * jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        return iou - distance - 0.5 * shape_cost
    # PIoU / PIoU2 (metrics.py PIoU branch, arXiv:2311.07716): corner-distance
    # penalty P relative to the target size
    dw1 = jnp.abs(jnp.minimum(b1_x2, b1_x1) - jnp.minimum(b2_x2, b2_x1))
    dw2 = jnp.abs(jnp.maximum(b1_x2, b1_x1) - jnp.maximum(b2_x2, b2_x1))
    dh1 = jnp.abs(jnp.minimum(b1_y2, b1_y1) - jnp.minimum(b2_y2, b2_y1))
    dh2 = jnp.abs(jnp.maximum(b1_y2, b1_y1) - jnp.maximum(b2_y2, b2_y1))
    P = ((dw1 + dw2) / jnp.abs(w2) + (dh1 + dh2) / jnp.abs(h2)) / 4
    piou_v1 = 1 - iou - jnp.exp(-(P**2)) + 1
    if PIoU:
        return 1 - piou_v1
    q = jnp.exp(-P)
    x = q * Lambda
    return 1 - 3 * x * jnp.exp(-(x**2)) * piou_v1


def wasserstein_similarity(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7, constant: float = 12.8) -> jnp.ndarray:
    """Normalized Wasserstein Distance similarity exp(-W2/C).

    The NWD term blended into the DEAL-YOLO box loss.
    Reference: ultralytics/utils/metrics.py:540-565 (wasserstein_loss).
    Inputs are xyxy (..., 4); returns (..., 1).
    """
    b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(pred, 4, -1)
    b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(target, 4, -1)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    cx1, cy1 = b1_x1 + w1 / 2, b1_y1 + h1 / 2
    cx2, cy2 = b2_x1 + w2 / 2, b2_y1 + h2 / 2
    center_d2 = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2 + eps
    wh_d2 = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    return jnp.exp(-jnp.sqrt(center_d2 + wh_d2) / constant)


# ---------------------------------------------------------------------------
# Wise-IoU v3 (reference: metrics.py:567-741 WiseIouLoss)
# ---------------------------------------------------------------------------

WIOU_ALPHA = 1.7
WIOU_DELTA = 2.7
WIOU_MOMENTUM = 1e-2


def wise_iou_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    iou_mean: jnp.ndarray,
    ltype: str = "WIoU",
    monotonous: bool | None = False,
    inner: bool = False,
    focaler: bool = False,
    ratio: float = 1.0,
    d: float = 0.0,
    u: float = 0.95,
    mpdiou_hw: float = 1.0,
    scale: float = 0.0,
    Lambda: float = 1.3,
    eps: float = 1e-7,
):
    """Wise-IoU with non-monotonic focusing (WIoU v3, arXiv:2301.10051).

    Functional port of the reference's stateful ``WiseIouLoss``
    (metrics.py:567-741, all 11 ltypes) — the running ``iou_mean`` buffer
    becomes an explicit input/output so the whole loss is a pure function
    (the trainer threads it through the train state).

    Args:
        pred, target: xyxy boxes, shape (..., 4).
        iou_mean: scalar running mean of (1 - IoU) (the reference's buffer).
        ltype: 'WIoU' | 'IoU' | 'GIoU' | 'DIoU' | 'CIoU' | 'EIoU' | 'SIoU'
            | 'MPDIoU' | 'ShapeIoU' | 'PIoU' | 'PIoU2'.
        monotonous: None = plain, True = monotonic FM (v2), False = v3.
        inner / focaler: base-iou transforms (reference forward ratio/d/u).

    Returns:
        (loss (...,), new_iou_mean scalar) — loss already focus-scaled.
    """
    pred_xy = (pred[..., :2] + pred[..., 2:4]) / 2
    target_xy = (target[..., :2] + target[..., 2:4]) / 2
    pred_wh = pred[..., 2:4] - pred[..., :2]
    target_wh = target[..., 2:4] - target[..., :2]
    min_coord = jnp.minimum(pred, target)
    max_coord = jnp.maximum(pred, target)
    wh_inter = jnp.clip(min_coord[..., 2:4] - max_coord[..., :2], 0, None)
    s_inter = wh_inter.prod(-1)
    s_union = pred_wh.prod(-1) + target_wh.prod(-1) - s_inter
    wh_box = max_coord[..., 2:4] - min_coord[..., :2]
    l2_box = (wh_box**2).sum(-1)
    d_center = pred_xy - target_xy
    l2_center = (d_center**2).sum(-1)
    if inner:
        iou_loss = 1.0 - get_inner_iou(pred, target, xywh=False, ratio=ratio, eps=eps)[..., 0]
    elif focaler:
        iou_loss = 1.0 - jnp.clip((s_inter / (s_union + eps) - d) / (u - d), 0.0, 1.0)
    else:
        iou_loss = 1.0 - s_inter / (s_union + eps)  # "iou" in the reference's dict

    if ltype == "WIoU":
        loss = jnp.exp(l2_center / jax.lax.stop_gradient(l2_box + eps)) * iou_loss
    elif ltype == "IoU":
        loss = iou_loss
    elif ltype == "GIoU":
        s_box = wh_box.prod(-1)
        loss = iou_loss + (s_box - s_union) / (s_box + eps)
    elif ltype == "DIoU":
        loss = iou_loss + l2_center / (l2_box + eps)
    elif ltype == "CIoU":
        v = 4 / math.pi**2 * (
            jnp.arctan(pred_wh[..., 0] / (pred_wh[..., 1] + 1e-4))
            - jnp.arctan(target_wh[..., 0] / (target_wh[..., 1] + 1e-4))
        ) ** 2
        alpha = v / (iou_loss + v + eps)
        loss = iou_loss + l2_center / (l2_box + eps) + jax.lax.stop_gradient(alpha) * v
    elif ltype == "EIoU":
        penalty = l2_center / (l2_box + eps) + ((d_center / (wh_box + eps)) ** 2).sum(-1)
        loss = iou_loss + penalty
    elif ltype == "SIoU":
        # reference _SIoU (theta=4): angle/dist/shape costs
        angle = jnp.arcsin(
            jnp.clip(jnp.abs(d_center).min(-1) / (jnp.sqrt(l2_center) + 1e-4), -1 + eps, 1 - eps)
        )
        angle = jnp.sin(2 * angle) - 2
        dist = angle[..., None] * (d_center / (wh_box + eps)) ** 2
        dist = 2 - jnp.exp(dist[..., 0]) - jnp.exp(dist[..., 1])
        d_shape = jnp.abs(pred_wh - target_wh)
        big_shape = jnp.maximum(pred_wh, target_wh)
        w_shape = 1 - jnp.exp(-d_shape[..., 0] / (big_shape[..., 0] + eps))
        h_shape = 1 - jnp.exp(-d_shape[..., 1] / (big_shape[..., 1] + eps))
        loss = iou_loss + (dist + w_shape**4 + h_shape**4) / 2
    elif ltype == "MPDIoU":
        d1 = ((target[..., :2] - pred[..., :2]) ** 2).sum(-1)
        d2 = ((target[..., 2:4] - pred[..., 2:4]) ** 2).sum(-1)
        loss = iou_loss + d1 / mpdiou_hw + d2 / mpdiou_hw
    elif ltype == "ShapeIoU":
        w1, h1 = pred_wh[..., 0], pred_wh[..., 1] + eps
        w2, h2 = target_wh[..., 0], target_wh[..., 1] + eps
        ww = 2 * w2**scale / (w2**scale + h2**scale)
        hh = 2 * h2**scale / (w2**scale + h2**scale)
        c2 = l2_box + eps
        center_distance = hh * d_center[..., 0] ** 2 + ww * d_center[..., 1] ** 2
        distance = center_distance / c2
        omiga_w = hh * jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = ww * jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
        loss = iou_loss + distance + 0.5 * shape_cost
    elif ltype in ("PIoU", "PIoU2"):
        w2 = target_wh[..., 0] + eps
        h2 = target_wh[..., 1] + eps
        dw1 = jnp.abs(jnp.minimum(pred[..., 2], pred[..., 0]) - jnp.minimum(target[..., 2], target[..., 0]))
        dw2 = jnp.abs(jnp.maximum(pred[..., 2], pred[..., 0]) - jnp.maximum(target[..., 2], target[..., 0]))
        dh1 = jnp.abs(jnp.minimum(pred[..., 3], pred[..., 1]) - jnp.minimum(target[..., 3], target[..., 1]))
        dh2 = jnp.abs(jnp.maximum(pred[..., 3], pred[..., 1]) - jnp.maximum(target[..., 3], target[..., 1]))
        P = ((dw1 + dw2) / jnp.abs(w2) + (dh1 + dh2) / jnp.abs(h2)) / 4
        piou_v1 = iou_loss - jnp.exp(-(P**2)) + 1
        if ltype == "PIoU":
            loss = piou_v1
        else:
            q = jnp.exp(-P)
            x = q * Lambda
            loss = 3 * x * jnp.exp(-(x**2)) * piou_v1
    else:
        raise ValueError(f"unsupported Wise-IoU ltype {ltype!r}")

    new_mean = iou_mean * (1 - WIOU_MOMENTUM) + WIOU_MOMENTUM * jax.lax.stop_gradient(iou_loss).mean()
    if monotonous is not None:
        beta = jax.lax.stop_gradient(iou_loss) / iou_mean
        if monotonous:
            loss = loss * jnp.sqrt(beta)
        else:  # non-monotonic focusing (v3): beta / (delta * alpha^(beta - delta))
            divisor = WIOU_DELTA * jnp.power(WIOU_ALPHA, beta - WIOU_DELTA)
            loss = loss * beta / divisor
    return loss, new_mean


def _rbox_covariance(boxes):
    """Gaussian covariance terms (a, b, c) of xywhr boxes (reference
    metrics.py:784 _get_covariance_matrix)."""
    a = boxes[..., 2:3] ** 2 / 12.0
    b = boxes[..., 3:4] ** 2 / 12.0
    r = boxes[..., 4:5]
    cos, sin = jnp.cos(r), jnp.sin(r)
    return (
        a * cos**2 + b * sin**2,
        a * sin**2 + b * cos**2,
        a * cos * sin - b * sin * cos,
    )


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Probabilistic IoU of rotated boxes xywhr (reference metrics.py:804,
    arXiv:2106.06072). Broadcasts over leading dims; returns (...,)."""
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]
    x2, y2 = obb2[..., 0:1], obb2[..., 1:2]
    a1, b1, c1 = _rbox_covariance(obb1)
    a2, b2, c2 = _rbox_covariance(obb2)
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0.0, None)
    det2 = jnp.clip(a2 * b2 - c2**2, 0.0, None)
    t3 = jnp.log(((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2) / (4 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return (1.0 - hd)[..., 0]


def xywhr2xyxyxyxy(rboxes: jnp.ndarray) -> jnp.ndarray:
    """xywhr -> 4 corner points (..., 4, 2) (reference ops.py:xywhr2xyxyxyxy)."""
    c, s = jnp.cos(rboxes[..., 4]), jnp.sin(rboxes[..., 4])
    ctr = rboxes[..., :2]
    w2, h2 = rboxes[..., 2] / 2.0, rboxes[..., 3] / 2.0
    v1 = jnp.stack([w2 * c, w2 * s], -1)
    v2 = jnp.stack([-h2 * s, h2 * c], -1)
    return jnp.stack([ctr + v1 + v2, ctr + v1 - v2, ctr - v1 - v2, ctr - v1 + v2], -2)
