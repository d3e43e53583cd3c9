"""Plotting utilities (reference utils/plotting.py, 1034 LoC): the
`Annotator` drawing surface, train-batch mosaics (`plot_images`), label
statistics (`plot_labels`), and intermediate feature-map dumps
(`feature_visualization`). cv2-backed; matplotlib only for the stats
figures."""

from __future__ import annotations

import math
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_PALETTE = [
    (4, 42, 255), (11, 219, 235), (243, 243, 243), (0, 223, 183), (17, 31, 104),
    (255, 111, 221), (255, 68, 79), (204, 237, 0), (0, 243, 68), (189, 0, 255),
    (0, 180, 255), (221, 0, 186), (255, 255, 0), (38, 192, 0), (1, 255, 179),
    (125, 0, 255), (123, 0, 104), (255, 27, 108), (252, 109, 47), (162, 255, 11),
]


def colors(i: int, bgr: bool = False):
    """Deterministic per-class color (reference plotting.py Colors)."""
    c = _PALETTE[int(i) % len(_PALETTE)]
    return (c[2], c[1], c[0]) if bgr else c


class Annotator:
    """Box/label/keypoint/mask drawing on a BGR image (plotting.py:Annotator)."""

    SKELETON = [
        (16, 14), (14, 12), (17, 15), (15, 13), (12, 13), (6, 12), (7, 13), (6, 7),
        (6, 8), (7, 9), (8, 10), (9, 11), (2, 3), (1, 2), (1, 3), (2, 4), (3, 5),
        (4, 6), (5, 7),
    ]

    def __init__(self, im: np.ndarray, line_width: Optional[int] = None):
        self.im = np.ascontiguousarray(im)
        self.lw = line_width or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)

    def box_label(self, box, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        import cv2

        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - h >= 3
            p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
            cv2.rectangle(self.im, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                        0, self.lw / 3, txt_color, tf, cv2.LINE_AA)

    def masks(self, masks: np.ndarray, color=None, alpha: float = 0.5):
        """masks (N, H, W) in image space; blended overlay."""
        if masks is None or len(masks) == 0:
            return
        overlay = self.im.astype(np.float32)
        for i, m in enumerate(masks):
            c = np.asarray(color if color is not None else colors(i, bgr=True), np.float32)
            mm = (m > 0.5)[..., None]
            overlay = np.where(mm, overlay * (1 - alpha) + alpha * c, overlay)
        self.im[:] = overlay.astype(np.uint8)

    def kpts(self, kpts: np.ndarray, radius: int = 5, kpt_line: bool = True, conf_thres: float = 0.25):
        """kpts (K, 2|3) pixel coords (COCO-17 order draws the skeleton)."""
        import cv2

        k = np.asarray(kpts, np.float32)
        for i, p in enumerate(k):
            if len(p) > 2 and p[2] < conf_thres:
                continue
            cv2.circle(self.im, (int(p[0]), int(p[1])), radius, colors(i, bgr=True), -1, cv2.LINE_AA)
        if kpt_line and len(k) == 17:
            for a, b in self.SKELETON:
                pa, pb = k[a - 1], k[b - 1]
                if len(pa) > 2 and (pa[2] < conf_thres or pb[2] < conf_thres):
                    continue
                cv2.line(self.im, (int(pa[0]), int(pa[1])), (int(pb[0]), int(pb[1])),
                         (255, 128, 0), max(self.lw - 1, 1), cv2.LINE_AA)

    def result(self) -> np.ndarray:
        return self.im


def plot_images(images: np.ndarray, bboxes: Optional[np.ndarray] = None,
                cls: Optional[np.ndarray] = None, mask: Optional[np.ndarray] = None,
                fname: str | Path = "train_batch.jpg", names: Optional[dict] = None,
                max_images: int = 16) -> Path:
    """Train-batch mosaic with GT boxes (plotting.py plot_images): images
    (B, H, W, 3) uint8 (or float 0-1), bboxes (B, M, 4) normalized cxcywh,
    cls (B, M), mask (B, M) validity."""
    import cv2

    b = min(len(images), max_images)
    n = math.ceil(b**0.5)
    h, w = images.shape[1:3]
    grid = np.full((n * h, n * w, 3), 114, np.uint8)
    for i in range(b):
        im = images[i]
        if im.dtype != np.uint8:
            im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        r, c = divmod(i, n)
        tile = np.ascontiguousarray(im[..., ::-1])  # RGB -> BGR
        ann = Annotator(tile, line_width=2)
        if bboxes is not None:
            for j in range(bboxes.shape[1]):
                if mask is not None and not bool(mask[i, j]):
                    continue
                cx, cy, bw, bh = bboxes[i, j]
                if bw <= 0 or bh <= 0:
                    continue
                box = [(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h]
                ci = int(cls[i, j]) if cls is not None else 0
                label = str(names.get(ci, ci)) if names else str(ci)
                ann.box_label(box, label, colors(ci, bgr=True))
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = ann.result()
    fname = Path(fname)
    fname.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(fname), grid)
    return fname


def plot_labels(bboxes: np.ndarray, cls: np.ndarray, save_dir: str | Path = ".",
                names: Optional[dict] = None) -> Path:
    """Label statistics figure (plotting.py plot_labels): class histogram +
    box center/size scatter from normalized cxcywh labels."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
    cls = np.asarray(cls).reshape(-1)
    fig, axs = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    nc = int(cls.max()) + 1 if len(cls) else 1
    axs[0, 0].hist(cls, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axs[0, 0].set_xlabel("classes")
    axs[0, 1].scatter(bboxes[:, 0], bboxes[:, 1], s=3, alpha=0.4)
    axs[0, 1].set_xlabel("x")
    axs[0, 1].set_ylabel("y")
    axs[1, 0].scatter(bboxes[:, 2], bboxes[:, 3], s=3, alpha=0.4)
    axs[1, 0].set_xlabel("width")
    axs[1, 0].set_ylabel("height")
    axs[1, 1].hist2d(bboxes[:, 2], bboxes[:, 3], bins=32)
    axs[1, 1].set_xlabel("wh density")
    out = Path(save_dir) / "labels.jpg"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pr_curve(px: np.ndarray, py: np.ndarray, ap50: np.ndarray,
                  save_path: str | Path, names: Optional[dict] = None) -> Path:
    """Precision-recall curve figure (reference metrics.py:1060
    plot_pr_curve): one line per class (legend when <21 classes) plus the
    bold all-classes mean annotated with mAP@0.5."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = names or {}
    py = np.asarray(py, np.float32).reshape(-1, len(px))
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            label = list(names.values())[i] if i < len(names) else str(i)
            ax.plot(px, y, linewidth=1, label=f"{label} {ap50[i]:.3f}")
        ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize="small")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    ax.plot(px, py.mean(0), linewidth=3, color="blue",
            label=f"all classes {ap50.mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_title("Precision-Recall Curve")
    out = Path(save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def plot_mc_curve(px: np.ndarray, py: np.ndarray, save_path: str | Path,
                  names: Optional[dict] = None, xlabel: str = "Confidence",
                  ylabel: str = "Metric") -> Path:
    """Metric-confidence curve figure (reference metrics.py:1087
    plot_mc_curve): per-class curves plus the smoothed all-classes mean
    annotated with its peak value and confidence."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from experiment_yolo_tpu.utils.metrics import smooth

    names = names or {}
    py = np.asarray(py, np.float32).reshape(-1, len(px))
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            label = list(names.values())[i] if i < len(names) else str(i)
            ax.plot(px, y, linewidth=1, label=label)
        ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize="small")
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = smooth(py.mean(0), 0.05)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_title(f"{ylabel}-{xlabel} Curve")
    out = Path(save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return out


def feature_visualization(x, module_type: str, stage: int, n: int = 32,
                          save_dir: str | Path = "runs/features") -> Optional[Path]:
    """Save a grid of the first n channels of a feature map
    (plotting.py feature_visualization). x: (B, H, W, C) array."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x)
    if x.ndim != 4 or x.shape[1] < 2 or x.shape[2] < 2:
        return None
    ch = min(n, x.shape[-1])
    cols = 8
    rows = math.ceil(ch / cols)
    fig, axs = plt.subplots(rows, cols, figsize=(cols * 1.4, rows * 1.4), tight_layout=True)
    axs = np.atleast_2d(axs)
    for i in range(rows * cols):
        ax = axs[i // cols, i % cols]
        ax.axis("off")
        if i < ch:
            ax.imshow(x[0, :, :, i], cmap="viridis")
    out = Path(save_dir) / f"stage{stage}_{module_type.split('.')[-1]}_features.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
