"""Host-side image augmentations (numpy/cv2).

Rebuild of the reference's ``ultralytics/data/augment.py`` pipeline
(``v8_transforms:969``): Mosaic -> RandomPerspective -> MixUp -> RandomHSV
-> RandomFlip x2 -> (pad to static label count). Augmentation runs on host
CPU like the reference's dataloader workers; the device step consumes fixed
(B, H, W, 3) uint8 batches + padded labels, keeping the TPU program
static-shape.

Labels here are dicts: {'img': HWC uint8 BGR, 'bboxes': (N,4) xyxy pixels,
'cls': (N,)}.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# LetterBox (reference augment.py:684)
# ---------------------------------------------------------------------------

def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    color: int = 114,
    scaleup: bool = True,
    center: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Ratio-preserving resize + pad. Returns (img, gain, (padw, padh)).

    Matches the reference's rounding: pad split with round(x - 0.1) /
    round(x + 0.1) so box rescaling is reproducible bit-for-bit-ish.
    """
    shape = img.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))  # w, h
    dw = new_shape[1] - new_unpad[0]
    dh = new_shape[0] - new_unpad[1]
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top = int(round(dh - 0.1)) if center else 0
    bottom = int(round(dh + 0.1))
    left = int(round(dw - 0.1)) if center else 0
    right = int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(color, color, color))
    return img, r, (left, top)


def letterbox_labels(labels: Dict, imgsz, scaleup: bool = True) -> Dict:
    """imgsz: int (square) or (h, w) tuple (rect batching)."""
    shape = (imgsz, imgsz) if isinstance(imgsz, int) else tuple(imgsz)
    img, r, (padw, padh) = letterbox(labels["img"], shape, scaleup=scaleup)
    bboxes = labels["bboxes"].copy()
    if len(bboxes):
        bboxes = bboxes * r
        bboxes[:, [0, 2]] += padw
        bboxes[:, [1, 3]] += padh
    return {**labels, "img": img, "bboxes": bboxes, "ratio_pad": (r, (padw, padh))}


# ---------------------------------------------------------------------------
# Mosaic (reference augment.py:135, _mosaic4:208)
# ---------------------------------------------------------------------------

def mosaic4(items: List[Dict], imgsz: int, rng: np.random.Generator) -> Dict:
    """Combine 4 images into a (2s, 2s) canvas around a random center.

    Output is the full 2s x 2s canvas with shifted labels; the following
    random_perspective crops back to s x s with border = -s/2 (reference
    Mosaic border convention).
    """
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((2 * s, 2 * s, 3), 114, dtype=np.uint8)
    all_boxes, all_cls = [], []
    for i, it in enumerate(items):
        img = it["img"]
        h, w = img.shape[:2]
        # resize longest side to s (reference load_image resizes on load)
        r = s / max(h, w)
        if r != 1:
            img = cv2.resize(img, (int(w * r), int(h * r)), interpolation=cv2.INTER_LINEAR)
            h, w = img.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, 2 * s), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(2 * s, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(it["bboxes"]):
            b = it["bboxes"] * r
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(it["cls"])
    bboxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    bboxes = np.clip(bboxes, 0, 2 * s)
    return {"img": canvas, "bboxes": bboxes.astype(np.float32), "cls": cls, "mosaic_border": (-s // 2, -s // 2)}


# ---------------------------------------------------------------------------
# RandomPerspective (reference augment.py:347)
# ---------------------------------------------------------------------------

def random_perspective(
    labels: Dict,
    degrees: float = 0.0,
    translate: float = 0.1,
    scale: float = 0.5,
    shear: float = 0.0,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
    rng: Optional[np.random.Generator] = None,
) -> Dict:
    """Affine/perspective warp with box transform + degenerate-box filter."""
    rng = rng or np.random.default_rng()
    img = labels["img"]
    border = labels.get("mosaic_border", border)
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    # transform matrices (center -> perspective -> rot/scale -> shear -> translate)
    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ P @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    bboxes, cls = labels["bboxes"], labels["cls"]
    if len(bboxes):
        n = len(bboxes)
        xy = np.ones((n * 4, 3))
        xy[:, :2] = bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = _box_candidates(bboxes.T * s, new.T)
        bboxes, cls = new[keep].astype(np.float32), cls[keep]
    return {**labels, "img": img, "bboxes": bboxes, "cls": cls}


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate post-warp boxes (reference augment.py:box_candidates)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


# ---------------------------------------------------------------------------
# HSV / flips / mixup (reference augment.py:584,627,326)
# ---------------------------------------------------------------------------

def random_hsv(img: np.ndarray, hgain=0.015, sgain=0.7, vgain=0.4, rng=None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(img.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        img = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return img


def random_flip(labels: Dict, direction: str, p: float, rng=None) -> Dict:
    rng = rng or np.random.default_rng()
    if rng.random() >= p:
        return labels
    img, bboxes = labels["img"], labels["bboxes"].copy()
    h, w = img.shape[:2]
    if direction == "horizontal":
        img = np.fliplr(img)
        if len(bboxes):
            bboxes[:, [0, 2]] = w - bboxes[:, [2, 0]]
    else:
        img = np.flipud(img)
        if len(bboxes):
            bboxes[:, [1, 3]] = h - bboxes[:, [3, 1]]
    return {**labels, "img": np.ascontiguousarray(img), "bboxes": bboxes}


def mixup(l1: Dict, l2: Dict, rng=None) -> Dict:
    """Beta(32,32) image blend with label union (reference augment.py:326)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    img = (l1["img"].astype(np.float32) * r + l2["img"].astype(np.float32) * (1 - r)).astype(np.uint8)
    return {
        **l1,
        "img": img,
        "bboxes": np.concatenate([l1["bboxes"], l2["bboxes"]]).astype(np.float32),
        "cls": np.concatenate([l1["cls"], l2["cls"]]),
    }


# ---------------------------------------------------------------------------
# Format: pad to static label count (TPU-specific; replaces torch collate)
# ---------------------------------------------------------------------------

def format_sample(labels: Dict, imgsz: int, max_labels: int) -> Dict[str, np.ndarray]:
    """Finalize one sample: BGR->RGB, normalized xywh labels padded to a
    fixed count so the device batch is static-shape."""
    img = labels["img"]
    h, w = img.shape[:2]
    bboxes, cls = labels["bboxes"], labels["cls"]
    n = min(len(bboxes), max_labels)
    out_boxes = np.zeros((max_labels, 4), np.float32)
    out_cls = np.zeros((max_labels,), np.int32)
    mask = np.zeros((max_labels,), bool)
    if n:
        b = bboxes[:n]
        xywh = np.stack(
            [
                (b[:, 0] + b[:, 2]) / 2 / w,
                (b[:, 1] + b[:, 3]) / 2 / h,
                (b[:, 2] - b[:, 0]) / w,
                (b[:, 3] - b[:, 1]) / h,
            ],
            axis=1,
        )
        out_boxes[:n] = xywh
        out_cls[:n] = cls[:n].astype(np.int32)
        mask[:n] = True
    return {
        "img": np.ascontiguousarray(img[..., ::-1]),  # BGR -> RGB, HWC uint8
        "bboxes": out_boxes,
        "cls": out_cls,
        "mask": mask,
    }
