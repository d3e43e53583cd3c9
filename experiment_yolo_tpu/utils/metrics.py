"""Detection metrics: IoU matching, per-class AP, DetMetrics.

Rebuild of the reference's mAP machinery (``utils/metrics.py:903-1405``:
ConfusionMatrix, ap_per_class with 101-point interpolation, Metric with
fitness = 0.1*mAP50 + 0.9*mAP50-95, DetMetrics) plus the validator's
``match_predictions`` (engine/validator.py:217). Host-side numpy — metric
accumulation is not a jit target (same design as the reference).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def box_iou_np(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Pairwise IoU (N,4) x (M,4) xyxy -> (N,M), numpy."""
    a1 = box1[:, None, :2]
    a2 = box1[:, None, 2:4]
    b1 = box2[None, :, :2]
    b2 = box2[None, :, 2:4]
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(-1)
    area1 = np.clip(box1[:, 2:4] - box1[:, :2], 0, None).prod(-1)
    area2 = np.clip(box2[:, 2:4] - box2[:, :2], 0, None).prod(-1)
    return inter / (area1[:, None] + area2[None] - inter + eps)


IOUV = np.linspace(0.5, 0.95, 10)  # mAP@0.5:0.95 thresholds


def match_predictions(
    pred_classes: np.ndarray,  # (N,)
    true_classes: np.ndarray,  # (M,)
    iou: np.ndarray,  # (N, M) pred x gt IoU
) -> np.ndarray:
    """TP matrix (N, 10): greedy unique matching per IoU threshold.

    Mirrors the reference's non-scipy branch (validator.py:239-258): for
    each threshold take (gt, pred) pairs above threshold with matching
    class, sort by IoU descending, enforce uniqueness of both sides.
    """
    correct = np.zeros((pred_classes.shape[0], IOUV.size), dtype=bool)
    correct_class = true_classes[None, :] == pred_classes[:, None]  # (N, M)
    iou = np.where(correct_class, iou, 0.0)
    for i, thr in enumerate(IOUV):
        pred_i, gt_i = np.nonzero(iou >= thr)
        if pred_i.size:
            ious = iou[pred_i, gt_i]
            order = ious.argsort()[::-1]
            pred_i, gt_i = pred_i[order], gt_i[order]
            _, keep_p = np.unique(pred_i, return_index=True)
            # unique gt first on the already-pred-unique set (reference order)
            pred_i, gt_i = pred_i[np.sort(keep_p)], gt_i[np.sort(keep_p)]
            _, keep_g = np.unique(gt_i, return_index=True)
            pred_i = pred_i[np.sort(keep_g)]
            correct[pred_i, i] = True
    return correct


def compute_ap(recall: np.ndarray, precision: np.ndarray) -> Tuple[float, np.ndarray, np.ndarray]:
    """101-point interpolated AP (reference metrics.py:1109)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x)
    return float(ap), mpre, mrec


def ap_per_class(
    tp: np.ndarray,  # (N, 10) bool
    conf: np.ndarray,  # (N,)
    pred_cls: np.ndarray,  # (N,)
    target_cls: np.ndarray,  # (Ngt,)
    eps: float = 1e-16,
) -> Dict[str, np.ndarray]:
    """Per-class precision/recall/AP (reference metrics.py:1142).

    Returns dict with p, r, ap (nc_present, 10), f1, unique_classes —
    precision/recall reported at max-F1 confidence like the reference.
    """
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]
    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]
    ap = np.zeros((nc, tp.shape[1]))
    p_curve = np.zeros((nc, 1000))
    r_curve = np.zeros((nc, 1000))
    x = np.linspace(0, 1, 1000)
    for ci, c in enumerate(unique_classes):
        i = pred_cls == c
        n_l = nt[ci]
        n_p = i.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[i]).cumsum(0)
        tpc = tp[i].cumsum(0)
        recall = tpc / (n_l + eps)
        precision = tpc / (tpc + fpc)
        r_curve[ci] = np.interp(-x, -conf[i], recall[:, 0], left=0)
        p_curve[ci] = np.interp(-x, -conf[i], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], _, _ = compute_ap(recall[:, j], precision[:, j])
    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    i = int(smooth(f1_curve.mean(0), 0.1).argmax())
    p, r, f1 = p_curve[:, i], r_curve[:, i], f1_curve[:, i]
    return {
        "p": p,
        "r": r,
        "f1": f1,
        "ap": ap,
        "unique_classes": unique_classes.astype(int),
        "nt": nt,
    }


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Box-filter smoothing (reference metrics.py:smooth)."""
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]))
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


class DetMetrics:
    """Accumulates (tp, conf, pred_cls, target_cls) and computes summary.

    fitness = 0.1 * mAP50 + 0.9 * mAP50-95 (reference metrics.py:1355).
    """

    def __init__(self, names: Dict[int, str] | None = None):
        self.names = names or {}
        self._tp: List[np.ndarray] = []
        self._conf: List[np.ndarray] = []
        self._pred_cls: List[np.ndarray] = []
        self._target_cls: List[np.ndarray] = []

    def update(self, tp, conf, pred_cls, target_cls):
        self._tp.append(tp)
        self._conf.append(conf)
        self._pred_cls.append(pred_cls)
        self._target_cls.append(target_cls)

    def result(self) -> Dict[str, float]:
        if not self._tp or sum(len(t) for t in self._target_cls) == 0:
            return {"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50-95": 0.0, "fitness": 0.0}
        tp = np.concatenate(self._tp)
        conf = np.concatenate(self._conf)
        pred_cls = np.concatenate(self._pred_cls)
        target_cls = np.concatenate(self._target_cls)
        if tp.shape[0] == 0:
            return {"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50-95": 0.0, "fitness": 0.0}
        r = ap_per_class(tp, conf, pred_cls, target_cls)
        ap50 = r["ap"][:, 0].mean() if len(r["ap"]) else 0.0
        ap = r["ap"].mean() if len(r["ap"]) else 0.0
        fitness = 0.1 * ap50 + 0.9 * ap
        out = {
            "precision": float(r["p"].mean()),
            "recall": float(r["r"].mean()),
            "mAP50": float(ap50),
            "mAP50-95": float(ap),
            "fitness": float(fitness),
        }
        self.per_class = r
        return out
