"""DOTA image/label window splitter (reference: ultralytics/data/split_dota.py).

Splits large aerial images into overlapping crop windows and remaps the
8-point OBB labels into each window, keeping objects whose
intersection-over-foreground with the window exceeds a threshold.

The reference depends on shapely for polygon intersection; this environment
has none, so ``_poly_rect_inter_area`` implements Sutherland-Hodgman clipping
of the (convex or mildly non-convex) quad against the axis-aligned window —
numerically identical for the valid DOTA quads shapely handles.
"""

from __future__ import annotations

import itertools
from math import ceil
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

__all__ = ["split_trainval", "split_test", "split_images_and_labels", "get_windows", "bbox_iof"]


def _poly_rect_inter_area(poly: np.ndarray, rect: Sequence[float]) -> float:
    """Area of polygon (n,2) clipped to axis-aligned rect (x1,y1,x2,y2)."""
    x1, y1, x2, y2 = rect

    def clip(points: List[np.ndarray], inside, intersect) -> List[np.ndarray]:
        out: List[np.ndarray] = []
        n = len(points)
        for i in range(n):
            cur, nxt = points[i], points[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def x_cut(a, b, x):
        t = (x - a[0]) / (b[0] - a[0] + 1e-12)
        return np.array([x, a[1] + t * (b[1] - a[1])])

    def y_cut(a, b, y):
        t = (y - a[1]) / (b[1] - a[1] + 1e-12)
        return np.array([a[0] + t * (b[0] - a[0]), y])

    pts = [p.astype(np.float64) for p in poly]
    pts = clip(pts, lambda p: p[0] >= x1, lambda a, b: x_cut(a, b, x1))
    if pts:
        pts = clip(pts, lambda p: p[0] <= x2, lambda a, b: x_cut(a, b, x2))
    if pts:
        pts = clip(pts, lambda p: p[1] >= y1, lambda a, b: y_cut(a, b, y1))
    if pts:
        pts = clip(pts, lambda p: p[1] <= y2, lambda a, b: y_cut(a, b, y2))
    if len(pts) < 3:
        return 0.0
    return _poly_area(np.stack(pts))


def _poly_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2)


def bbox_iof(polygon1: np.ndarray, bbox2: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Intersection-over-foreground of label quads vs windows.

    polygon1: (n, 8) label polygons; bbox2: (m, 4) xyxy windows.
    Returns (n, m). Matches the reference's shapely computation
    (split_dota.py:20-54) via direct rect clipping.
    """
    polys = polygon1.reshape(-1, 4, 2)
    n, m = polys.shape[0], bbox2.shape[0]
    out = np.zeros((n, m), np.float64)
    # cheap reject: axis-aligned hulls don't touch
    lt = polys.min(-2)
    rb = polys.max(-2)
    for i in range(n):
        area = max(_poly_area(polys[i]), eps)
        for j in range(m):
            if rb[i, 0] <= bbox2[j, 0] or rb[i, 1] <= bbox2[j, 1] or lt[i, 0] >= bbox2[j, 2] or lt[i, 1] >= bbox2[j, 3]:
                continue
            out[i, j] = _poly_rect_inter_area(polys[i], bbox2[j]) / area
    return out


def load_yolo_dota(data_root: str, split: str = "train") -> List[dict]:
    """Scan images/<split> + labels/<split>, returning annotation dicts with
    filepath / normalized (cls, 8-pt) label rows / ori_size."""
    import cv2

    root = Path(data_root)
    im_dir = root / "images" / split
    lb_dir = root / "labels" / split
    assert im_dir.exists(), f"missing {im_dir}"
    annos = []
    for im_file in sorted(im_dir.iterdir()):
        if im_file.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = cv2.imread(str(im_file))
        if img is None:
            raise FileNotFoundError(f"could not read image {im_file}")
        h, w = img.shape[:2]
        lb_file = lb_dir / f"{im_file.stem}.txt"
        if lb_file.exists():
            rows = [x.split() for x in lb_file.read_text().splitlines() if x.strip()]
            label = np.array(rows, dtype=np.float32) if rows else np.zeros((0, 9), np.float32)
        else:
            label = np.zeros((0, 9), np.float32)
        annos.append({"filepath": str(im_file), "label": label, "ori_size": (h, w)})
    return annos


def get_windows(
    im_size: Tuple[int, int],
    crop_sizes: Sequence[int] = (1024,),
    gaps: Sequence[int] = (200,),
    im_rate_thr: float = 0.6,
    eps: float = 0.01,
) -> np.ndarray:
    """Sliding crop windows (x1,y1,x2,y2) covering an (h, w) image.

    Windows whose in-image area fraction is below ``im_rate_thr`` are
    dropped (unless none passes, in which case the best ones are kept) —
    reference split_dota.py:89-130."""
    h, w = im_size
    windows = []
    for crop_size, gap in zip(crop_sizes, gaps):
        assert crop_size > gap, f"invalid crop_size/gap pair [{crop_size} {gap}]"
        step = crop_size - gap
        xn = 1 if w <= crop_size else ceil((w - crop_size) / step + 1)
        xs = [step * i for i in range(xn)]
        if len(xs) > 1 and xs[-1] + crop_size > w:
            xs[-1] = w - crop_size
        yn = 1 if h <= crop_size else ceil((h - crop_size) / step + 1)
        ys = [step * i for i in range(yn)]
        if len(ys) > 1 and ys[-1] + crop_size > h:
            ys[-1] = h - crop_size
        start = np.array(list(itertools.product(xs, ys)), dtype=np.int64)
        windows.append(np.concatenate([start, start + crop_size], axis=1))
    windows = np.concatenate(windows, axis=0)

    clipped = windows.copy()
    clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
    clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
    im_areas = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    win_areas = (windows[:, 2] - windows[:, 0]) * (windows[:, 3] - windows[:, 1])
    im_rates = im_areas / win_areas
    if not (im_rates > im_rate_thr).any():
        im_rates[np.abs(im_rates - im_rates.max()) < eps] = 1
    return windows[im_rates > im_rate_thr]


def get_window_obj(anno: dict, windows: np.ndarray, iof_thr: float = 0.7) -> List[np.ndarray]:
    """Per-window label subsets (pixel coords) by IoF threshold."""
    h, w = anno["ori_size"]
    label = anno["label"].copy()
    if len(label) == 0:
        return [np.zeros((0, 9), np.float32) for _ in range(len(windows))]
    label[:, 1::2] *= w
    label[:, 2::2] *= h
    iofs = bbox_iof(label[:, 1:], windows)
    return [label[iofs[:, i] >= iof_thr] for i in range(len(windows))]


def crop_and_save(anno: dict, windows: np.ndarray, window_objs: List[np.ndarray],
                  im_dir: str, lb_dir: str) -> None:
    """Write each window crop + its renormalized labels.

    Output name convention matches the reference exactly:
    ``{stem}__{crop_w}__{x_start}___{y_start}`` (split_dota.py:146-188)."""
    import cv2

    im = cv2.imread(anno["filepath"])
    if im is None:
        raise FileNotFoundError(f"could not read image {anno['filepath']}")
    name = Path(anno["filepath"]).stem
    for i, window in enumerate(windows):
        x_start, y_start, x_stop, y_stop = window.tolist()
        new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
        patch = im[y_start:y_stop, x_start:x_stop]
        ph, pw = patch.shape[:2]
        cv2.imwrite(str(Path(im_dir) / f"{new_name}.jpg"), patch)
        label = window_objs[i]
        if len(label) == 0:
            continue
        label = label.copy()
        label[:, 1::2] -= x_start
        label[:, 2::2] -= y_start
        label[:, 1::2] /= pw
        label[:, 2::2] /= ph
        with open(Path(lb_dir) / f"{new_name}.txt", "w") as f:
            for lb in label:
                coords = " ".join(f"{c:.6g}" for c in lb[1:])
                f.write(f"{int(lb[0])} {coords}\n")


def split_images_and_labels(data_root: str, save_dir: str, split: str = "train",
                            crop_sizes: Sequence[int] = (1024,), gaps: Sequence[int] = (200,)) -> None:
    save = Path(save_dir)
    im_dir = save / "images" / split
    lb_dir = save / "labels" / split
    im_dir.mkdir(parents=True, exist_ok=True)
    lb_dir.mkdir(parents=True, exist_ok=True)
    for anno in load_yolo_dota(data_root, split):
        windows = get_windows(anno["ori_size"], crop_sizes, gaps)
        objs = get_window_obj(anno, windows)
        crop_and_save(anno, windows, objs, str(im_dir), str(lb_dir))


def split_trainval(data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200,
                   rates: Sequence[float] = (1.0,)) -> None:
    """Split DOTA train+val at one or more scale rates (split_dota.py:220)."""
    crop_sizes = [int(crop_size / r) for r in rates]
    gaps = [int(gap / r) for r in rates]
    for split in ("train", "val"):
        split_images_and_labels(data_root, save_dir, split, crop_sizes, gaps)


def split_test(data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200,
               rates: Sequence[float] = (1.0,)) -> None:
    """Split the unlabeled DOTA test set (split_dota.py:250)."""
    import cv2

    crop_sizes = [int(crop_size / r) for r in rates]
    gaps = [int(gap / r) for r in rates]
    out = Path(save_dir) / "images" / "test"
    out.mkdir(parents=True, exist_ok=True)
    im_dir = Path(data_root) / "images" / "test"
    assert im_dir.exists(), f"missing {im_dir}"
    for im_file in sorted(im_dir.iterdir()):
        if im_file.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        im = cv2.imread(str(im_file))
        if im is None:
            raise FileNotFoundError(f"could not read image {im_file}")
        h, w = im.shape[:2]
        for window in get_windows((h, w), crop_sizes, gaps):
            x_start, y_start, x_stop, y_stop = window.tolist()
            new_name = f"{im_file.stem}__{x_stop - x_start}__{x_start}___{y_start}"
            cv2.imwrite(str(out / f"{new_name}.jpg"), im[y_start:y_stop, x_start:x_stop])
