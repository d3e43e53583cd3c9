"""Detection metrics: IoU matching, per-class AP, DetMetrics.

Rebuild of the reference's mAP machinery (``utils/metrics.py:903-1405``:
ConfusionMatrix, ap_per_class with 101-point interpolation, Metric with
fitness = 0.1*mAP50 + 0.9*mAP50-95, DetMetrics) plus the validator's
``match_predictions`` (engine/validator.py:217). Host-side numpy — metric
accumulation is not a jit target (same design as the reference).
"""

from __future__ import annotations

from pathlib import Path
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
    curves: bool = False,
) -> Dict[str, np.ndarray]:
    """Per-class precision/recall/AP (reference metrics.py:1142).

    Returns dict with p, r, ap (nc_present, 10), f1, unique_classes —
    precision/recall reported at max-F1 confidence like the reference.
    With ``curves=True`` also returns the figure inputs (reference
    metrics.py:537-546 with plot=True): ``px`` (1000,), the per-class
    P/R/F1-vs-confidence curves, and ``prec_values`` — precision vs recall
    at IoU 0.5, interpolated to px, for the PR-curve figure.
    """
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]
    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]
    ap = np.zeros((nc, tp.shape[1]))
    p_curve = np.zeros((nc, 1000))
    r_curve = np.zeros((nc, 1000))
    x = np.linspace(0, 1, 1000)
    prec_values = np.zeros((nc, 1000))
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
            ap[ci, j], mpre, mrec = compute_ap(recall[:, j], precision[:, j])
            if curves and j == 0:
                prec_values[ci] = np.interp(x, mrec, mpre)
    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    i = int(smooth(f1_curve.mean(0), 0.1).argmax())
    p, r, f1 = p_curve[:, i], r_curve[:, i], f1_curve[:, i]
    out = {
        "p": p,
        "r": r,
        "f1": f1,
        "ap": ap,
        "unique_classes": unique_classes.astype(int),
        "nt": nt,
    }
    if curves:
        out.update(px=x, p_curve=p_curve, r_curve=r_curve, f1_curve=f1_curve,
                   prec_values=prec_values)
    return out


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Box-filter smoothing (reference metrics.py:smooth)."""
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]))
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


class ConfusionMatrix:
    """Detection confusion matrix (reference metrics.py:903).

    (nc+1) x (nc+1): last row/col is background (FP row, FN col). Matching
    at IoU >= iou_thres, predictions gated at conf >= conf_thres.
    """

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres
        self.matrix = np.zeros((nc + 1, nc + 1), dtype=np.int64)

    def process_batch(self, detections: np.ndarray, gt_bboxes: np.ndarray, gt_cls: np.ndarray) -> None:
        """detections (N, 6) [xyxy, conf, cls]; gt_bboxes (M, 4); gt_cls (M,)."""
        gt_cls = np.asarray(gt_cls, int)
        if detections is None or len(detections) == 0:
            for c in gt_cls:
                self.matrix[self.nc, c] += 1  # background FN
            return
        detections = detections[detections[:, 4] >= self.conf]
        det_cls = detections[:, 5].astype(int)
        if len(gt_cls) == 0:
            for c in det_cls:
                self.matrix[c, self.nc] += 1  # background FP
            return
        iou = box_iou_np(gt_bboxes, detections[:, :4])
        x = np.argwhere(iou >= self.iou_thres)
        if x.shape[0]:
            ious = iou[x[:, 0], x[:, 1]]
            order = ious.argsort()[::-1]
            x = x[order]
            # unique gt then unique det (reference's match dedup)
            _, keep_g = np.unique(x[:, 0], return_index=True)
            x = x[np.sort(keep_g)]
            _, keep_d = np.unique(x[:, 1], return_index=True)
            x = x[np.sort(keep_d)]
        matched_gt = set(x[:, 0].tolist()) if x.shape[0] else set()
        matched_det = set(x[:, 1].tolist()) if x.shape[0] else set()
        for gi, di in x:
            self.matrix[det_cls[di], gt_cls[gi]] += 1
        for gi, c in enumerate(gt_cls):
            if gi not in matched_gt:
                self.matrix[self.nc, c] += 1  # FN
        for di, c in enumerate(det_cls):
            if di not in matched_det:
                self.matrix[c, self.nc] += 1  # FP

    def tp_fp(self):
        tp = self.matrix.diagonal()[: self.nc]
        fp = self.matrix[: self.nc].sum(1) - tp
        return tp, fp

    def plot(self, path, names: dict | None = None, normalize: bool = True):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        m = self.matrix.astype(float)
        if normalize:
            m = m / (m.sum(0, keepdims=True) + 1e-9)
        labels = [str((names or {}).get(i, i)) for i in range(self.nc)] + ["background"]
        fig, ax = plt.subplots(figsize=(max(6, self.nc), max(5, self.nc * 0.8)))
        im = ax.imshow(m, cmap="Blues")
        ax.set_xticks(range(self.nc + 1), labels, rotation=90, fontsize=8)
        ax.set_yticks(range(self.nc + 1), labels, fontsize=8)
        ax.set_xlabel("True")
        ax.set_ylabel("Predicted")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path


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

    def plot(self, save_dir: str | Path = ".") -> list:
        """Save PR / F1 / P / R curve figures (reference metrics.py:1060-1107
        plot_pr_curve + plot_mc_curve). Returns the written paths."""
        from pathlib import Path as _P

        from experiment_yolo_tpu.utils.plotting import plot_mc_curve, plot_pr_curve

        if not self._tp or sum(len(t) for t in self._target_cls) == 0:
            return []
        tp = np.concatenate(self._tp)  # (0, 10) is fine: zero curves
        r = ap_per_class(tp, np.concatenate(self._conf),
                         np.concatenate(self._pred_cls),
                         np.concatenate(self._target_cls), curves=True)
        names = {int(c): self.names.get(int(c), str(int(c)))
                 for c in r["unique_classes"]}
        sd = _P(save_dir)
        sd.mkdir(parents=True, exist_ok=True)
        written = [
            plot_pr_curve(r["px"], r["prec_values"], r["ap"][:, 0],
                          sd / "PR_curve.png", names),
            plot_mc_curve(r["px"], r["f1_curve"], sd / "F1_curve.png", names,
                          ylabel="F1"),
            plot_mc_curve(r["px"], r["p_curve"], sd / "P_curve.png", names,
                          ylabel="Precision"),
            plot_mc_curve(r["px"], r["r_curve"], sd / "R_curve.png", names,
                          ylabel="Recall"),
        ]
        return written
