"""Host-side image augmentations (numpy/cv2).

Rebuild of the reference's ``ultralytics/data/augment.py`` pipeline
(``v8_transforms:969``): Mosaic -> RandomPerspective -> MixUp -> RandomHSV
-> RandomFlip x2 -> (pad to static label count). Augmentation runs on host
CPU like the reference's dataloader workers; the device step consumes fixed
(B, H, W, 3) uint8 batches + padded labels, keeping the TPU program
static-shape.

Labels here are dicts: {'img': HWC uint8 BGR, 'bboxes': (N,4) xyxy pixels,
'cls': (N,)}, with optional task geometry carried through every transform
(reference utils/instance.py Instances semantics):

- 'segments': list of (Si, 2) float32 pixel polygons, one per instance;
- 'keypoints': (N, nk, 3) float32 pixel keypoints (x, y, visibility);
- 'obb': (N, 4, 2) float32 pixel corner points of rotated boxes.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def _scale_shift_points(labels: Dict, r: float, padw: float, padh: float) -> Dict:
    """Apply x' = x*r + pad to every point-geometry field in-place-ish."""
    out = dict(labels)
    if labels.get("segments") is not None:
        out["segments"] = [s * r + np.asarray([padw, padh], np.float32) for s in labels["segments"]]
    if labels.get("keypoints") is not None:
        kp = labels["keypoints"].copy()
        kp[..., 0] = kp[..., 0] * r + padw
        kp[..., 1] = kp[..., 1] * r + padh
        out["keypoints"] = kp
    if labels.get("obb") is not None:
        out["obb"] = labels["obb"] * r + np.asarray([padw, padh], np.float32)
    return out


def _take_instances(labels: Dict, keep) -> Dict:
    """Index every per-instance field by a boolean/int index array."""
    out = dict(labels)
    out["bboxes"] = labels["bboxes"][keep]
    out["cls"] = labels["cls"][keep]
    if labels.get("segments") is not None:
        idx = np.flatnonzero(keep) if np.asarray(keep).dtype == bool else np.asarray(keep)
        out["segments"] = [labels["segments"][i] for i in idx]
    if labels.get("keypoints") is not None:
        out["keypoints"] = labels["keypoints"][keep]
    if labels.get("obb") is not None:
        out["obb"] = labels["obb"][keep]
    return out


def _cat_instances(l1: Dict, l2: Dict) -> Dict:
    out = {
        "bboxes": np.concatenate([l1["bboxes"], l2["bboxes"]]).astype(np.float32),
        "cls": np.concatenate([l1["cls"], l2["cls"]]),
    }
    if l1.get("segments") is not None or l2.get("segments") is not None:
        out["segments"] = list(l1.get("segments") or []) + list(l2.get("segments") or [])
    if l1.get("keypoints") is not None:
        out["keypoints"] = np.concatenate([l1["keypoints"], l2["keypoints"]])
    if l1.get("obb") is not None:
        out["obb"] = np.concatenate([l1["obb"], l2["obb"]])
    return out


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
    labels = _scale_shift_points(labels, r, padw, padh)
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
    all_shifted = []
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
            shifted = _scale_shift_points(it, r, padw, padh)
            shifted["bboxes"] = b
            all_shifted.append(shifted)
    if all_shifted:
        merged = all_shifted[0]
        for nxt in all_shifted[1:]:
            merged = _cat_instances(merged, nxt)
    else:
        merged = {"bboxes": np.zeros((0, 4), np.float32), "cls": np.zeros((0,), np.float32)}
        for k in ("segments", "keypoints", "obb"):
            if items[0].get(k) is not None:
                merged[k] = [] if k == "segments" else np.zeros((0,) + items[0][k].shape[1:], np.float32)
    merged["bboxes"] = np.clip(merged["bboxes"], 0, 2 * s).astype(np.float32)
    if merged.get("segments") is not None:
        merged["segments"] = [np.clip(p, 0, 2 * s) for p in merged["segments"]]
    if merged.get("obb") is not None:
        merged["obb"] = np.clip(merged["obb"], 0, 2 * s)
    if merged.get("keypoints") is not None:  # out-of-canvas kpts -> invisible
        kp = merged["keypoints"]
        oob = (kp[..., 0] < 0) | (kp[..., 0] >= 2 * s) | (kp[..., 1] < 0) | (kp[..., 1] >= 2 * s)
        kp[..., 2] = np.where(oob, 0.0, kp[..., 2])
        merged["keypoints"] = kp
    return {"img": canvas, **merged, "mosaic_border": (-s // 2, -s // 2)}


def mosaic9(items: List[Dict], imgsz: int, rng: np.random.Generator) -> Dict:
    """Combine 9 images into a 3x3 grid, cropped to the (2s, 2s) canvas
    (reference augment.py:_mosaic9): same output contract as :func:`mosaic4`,
    so the following random_perspective border-crop is shared."""
    s = imgsz
    canvas = np.full((3 * s, 3 * s, 3), 114, dtype=np.uint8)
    hp = wp = -1  # previous tile h, w
    h0 = w0 = 0
    all_shifted = []
    for i, it in enumerate(items):
        img = it["img"]
        h, w = img.shape[:2]
        r = s / max(h, w)
        if r != 1:
            img = cv2.resize(img, (int(w * r), int(h * r)), interpolation=cv2.INTER_LINEAR)
            h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = s, s, s + w, s + h
        elif i == 1:  # top
            c = s, s - h, s + w, s
        elif i == 2:  # top right
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:  # bottom
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:  # bottom left
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:  # left
            c = s - w, s + h0 - h, s, s + h0
        else:  # top left
            c = s - w, s + h0 - hp - h, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(x, 0) for x in c)
        canvas[y1:y2, x1:x2] = img[y1 - padh :, x1 - padw :]
        hp, wp = h, w
        if len(it["bboxes"]):
            # shift into canvas coords, then into the final (2s, 2s) crop
            off_x, off_y = padw - s // 2, padh - s // 2
            b = it["bboxes"] * r
            b[:, [0, 2]] += off_x
            b[:, [1, 3]] += off_y
            shifted = _scale_shift_points(it, r, off_x, off_y)
            shifted["bboxes"] = b
            all_shifted.append(shifted)
    if all_shifted:
        merged = all_shifted[0]
        for nxt in all_shifted[1:]:
            merged = _cat_instances(merged, nxt)
    else:
        merged = {"bboxes": np.zeros((0, 4), np.float32), "cls": np.zeros((0,), np.float32)}
        for k in ("segments", "keypoints", "obb"):
            if items[0].get(k) is not None:
                merged[k] = [] if k == "segments" else np.zeros((0,) + items[0][k].shape[1:], np.float32)
    crop = canvas[s // 2 : s // 2 + 2 * s, s // 2 : s // 2 + 2 * s]
    merged["bboxes"] = np.clip(merged["bboxes"], 0, 2 * s).astype(np.float32)
    if merged.get("segments") is not None:
        merged["segments"] = [np.clip(p, 0, 2 * s) for p in merged["segments"]]
    if merged.get("obb") is not None:
        merged["obb"] = np.clip(merged["obb"], 0, 2 * s)
    if merged.get("keypoints") is not None:
        kp = merged["keypoints"]
        oob = (kp[..., 0] < 0) | (kp[..., 0] >= 2 * s) | (kp[..., 1] < 0) | (kp[..., 1] >= 2 * s)
        kp[..., 2] = np.where(oob, 0.0, kp[..., 2])
        merged["keypoints"] = kp
    return {"img": np.ascontiguousarray(crop), **merged, "mosaic_border": (-s // 2, -s // 2)}


def _bbox_ioa(box1: np.ndarray, box2: np.ndarray) -> np.ndarray:
    """Intersection over box2 area (reference utils/metrics.py:bbox_ioa)."""
    ix = (np.minimum(box1[:, None, 2], box2[None, :, 2]) - np.maximum(box1[:, None, 0], box2[None, :, 0])).clip(0)
    iy = (np.minimum(box1[:, None, 3], box2[None, :, 3]) - np.maximum(box1[:, None, 1], box2[None, :, 1])).clip(0)
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1]) + 1e-7
    return ix * iy / area2[None]


def copy_paste(labels: Dict, p: float, rng: np.random.Generator) -> Dict:
    """Copy-Paste augmentation (reference augment.py:753, arXiv:2012.07177):
    horizontally-flipped segment instances whose flipped box overlaps every
    existing box by IoA < 0.3 are pasted back into the image. Segments-only
    (matches the reference — detect/pose/obb labels pass through)."""
    segments = labels.get("segments")
    if not p or not segments or len(segments) == 0:
        return labels
    im = labels["img"]
    h, w = im.shape[:2]
    boxes = labels["bboxes"]  # pixel xyxy
    flip_boxes = boxes.copy()
    flip_boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    ioa = _bbox_ioa(flip_boxes, boxes)
    candidates = np.nonzero((ioa < 0.30).all(1))[0]
    k = round(p * len(candidates))
    if k == 0:
        return labels
    chosen = rng.choice(candidates, size=k, replace=False)
    im_new = np.zeros(im.shape, np.uint8)
    new_cls, new_boxes, new_segs = [], [], []
    for j in chosen:
        seg = segments[j].copy()
        seg[:, 0] = w - seg[:, 0]
        new_cls.append(labels["cls"][j])
        new_boxes.append(flip_boxes[j])
        new_segs.append(seg)
        cv2.drawContours(im_new, [seg.astype(np.int32)], -1, (1, 1, 1), cv2.FILLED)
    result = cv2.flip(im, 1)
    i = cv2.flip(im_new, 1).astype(bool)
    im[i] = result[i]
    out = dict(labels)
    out["img"] = im
    out["cls"] = np.concatenate([labels["cls"], np.asarray(new_cls, np.float32)])
    out["bboxes"] = np.concatenate([boxes, np.stack(new_boxes)]).astype(np.float32)
    out["segments"] = list(segments) + new_segs
    return out


def albumentations_transform(img: np.ndarray, p: float = 1.0):
    """Optional Albumentations hook (reference augment.py:819): applies the
    reference's default pixel-level recipe (Blur/MedianBlur/ToGray/CLAHE at
    p=0.01 each) when the albumentations package is importable; identity
    otherwise (it is not bundled in this environment)."""
    try:
        import albumentations as A_  # pragma: no cover - optional dep
    except ImportError:
        return img
    tf = A_.Compose(  # pragma: no cover
        [A_.Blur(p=0.01), A_.MedianBlur(p=0.01), A_.ToGray(p=0.01), A_.CLAHE(p=0.01)]
    )
    return tf(image=img)["image"]  # pragma: no cover


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

    def warp_pts(pts):  # (..., 2) -> transformed (..., 2)
        shape = pts.shape
        xy = np.ones((int(np.prod(shape[:-1])), 3))
        xy[:, :2] = pts.reshape(-1, 2)
        xy = xy @ M.T
        out = xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]
        return out.reshape(shape).astype(np.float32)

    labels = dict(labels)
    bboxes, cls = labels["bboxes"], labels["cls"]
    if len(bboxes):
        n = len(bboxes)
        if labels.get("segments"):
            # reference recomputes boxes from warped segments (augment.py:480)
            segs = [np.clip(warp_pts(p), [0, 0], [width, height]) for p in labels["segments"]]
            new = np.stack(
                [np.concatenate([p.min(0), p.max(0)]) for p in segs], 0
            ).astype(np.float32)
            labels["segments"] = segs
        elif labels.get("obb") is not None:
            corners = warp_pts(labels["obb"])  # (N, 4, 2); NOT clipped (rotation-safe)
            labels["obb"] = corners
            new = np.concatenate([corners.min(1), corners.max(1)], -1).astype(np.float32)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        else:
            xy = warp_pts(bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n, 4, 2)).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        if labels.get("keypoints") is not None:
            kp = labels["keypoints"].copy()
            kp[..., :2] = warp_pts(kp[..., :2])
            oob = (kp[..., 0] < 0) | (kp[..., 0] >= width) | (kp[..., 1] < 0) | (kp[..., 1] >= height)
            kp[..., 2] = np.where(oob, 0.0, kp[..., 2])  # reference apply_keypoints
            labels["keypoints"] = kp
        keep = _box_candidates(bboxes.T * s, new.T)
        labels["bboxes"] = new
        labels = _take_instances(labels, keep)
        bboxes, cls = labels["bboxes"].astype(np.float32), labels["cls"]
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


def random_flip(labels: Dict, direction: str, p: float, rng=None, flip_idx=None) -> Dict:
    """Image + geometry flip; ``flip_idx`` swaps left/right keypoints on a
    horizontal flip (reference augment.py:RandomFlip, data.yaml flip_idx)."""
    rng = rng or np.random.default_rng()
    if rng.random() >= p:
        return labels
    labels = dict(labels)
    img, bboxes = labels["img"], labels["bboxes"].copy()
    h, w = img.shape[:2]
    axis = 0 if direction == "horizontal" else 1
    extent = w if direction == "horizontal" else h

    def flip_pts(pts):
        pts = pts.copy()
        pts[..., axis] = extent - pts[..., axis]
        return pts

    if direction == "horizontal":
        img = np.fliplr(img)
        if len(bboxes):
            bboxes[:, [0, 2]] = w - bboxes[:, [2, 0]]
    else:
        img = np.flipud(img)
        if len(bboxes):
            bboxes[:, [1, 3]] = h - bboxes[:, [3, 1]]
    if labels.get("segments"):
        labels["segments"] = [flip_pts(p) for p in labels["segments"]]
    if labels.get("obb") is not None:
        labels["obb"] = flip_pts(labels["obb"])
    if labels.get("keypoints") is not None:
        kp = labels["keypoints"].copy()
        kp[..., axis] = extent - kp[..., axis]
        if direction == "horizontal" and flip_idx is not None:
            kp = kp[:, np.asarray(flip_idx, np.int64)]
        labels["keypoints"] = kp
    return {**labels, "img": np.ascontiguousarray(img), "bboxes": bboxes}


def mixup(l1: Dict, l2: Dict, rng=None) -> Dict:
    """Beta(32,32) image blend with label union (reference augment.py:326)."""
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    img = (l1["img"].astype(np.float32) * r + l2["img"].astype(np.float32) * (1 - r)).astype(np.uint8)
    return {**l1, "img": img, **_cat_instances(l1, l2)}


# ---------------------------------------------------------------------------
# Format: pad to static label count (TPU-specific; replaces torch collate)
# ---------------------------------------------------------------------------

def polygons2mask_overlap(segments, shape, downsample: int = 4):
    """Rasterize polygons into ONE overlap-index image + area-sorted order.

    Reference data/utils.py:polygons2masks_overlap: instances sorted by
    area descending are drawn with value i+1 (later/smaller instances
    overwrite), and the sort order is returned so boxes/cls can be
    reordered to match the index values.
    """
    h, w = shape[0] // downsample, shape[1] // downsample
    mask = np.zeros((h, w), np.uint8 if len(segments) < 255 else np.int32)
    areas = []
    polys = []
    for seg in segments:
        p = np.asarray(seg, np.float64) / downsample
        polys.append(p.astype(np.int32))
        areas.append(cv2.contourArea(p.astype(np.float32)) if len(p) >= 3 else 0.0)
    order = np.argsort(-np.asarray(areas)) if areas else np.zeros(0, np.int64)
    for new_i, src_i in enumerate(order):
        cv2.fillPoly(mask, [polys[src_i]], color=int(new_i + 1))
    return mask.astype(np.int32), order


def xyxyxyxy2xywhr(corners: np.ndarray) -> np.ndarray:
    """(N, 4, 2) corner points -> (N, 5) xywhr via minAreaRect (reference
    ops.py:xyxyxyxy2xywhr; angle normalized to [0, pi/2))."""
    out = np.zeros((len(corners), 5), np.float32)
    for i, pts in enumerate(corners):
        (cx, cy), (rw, rh), angle = cv2.minAreaRect(pts.astype(np.float32))
        out[i] = cx, cy, rw, rh, angle / 180 * np.pi
    return out


def format_sample(
    labels: Dict,
    imgsz: int,
    max_labels: int,
    task: str = "detect",
    kpt_shape=(17, 3),
    mask_ratio: int = 4,
) -> Dict[str, np.ndarray]:
    """Finalize one sample: BGR->RGB, normalized labels padded to a fixed
    count so the device batch is static-shape. Task extras (reference
    augment.py:Format):

    - segment: 'masks' (H/r, W/r) int32 overlap-index image; instances
      reordered by area desc to match the mask values;
    - pose: 'keypoints' (max_labels, nk, 3) normalized xy + visibility;
    - obb: 'bboxes' becomes (max_labels, 5) normalized xywh + angle rad.
    """
    img = labels["img"]
    h, w = img.shape[:2]
    bboxes, cls = labels["bboxes"], labels["cls"]
    out: Dict[str, np.ndarray] = {}

    if task == "segment":
        segs = labels.get("segments") or []
        masks, order = polygons2mask_overlap(segs, (h, w), mask_ratio)
        out["masks"] = masks
        if len(order):
            bboxes, cls = bboxes[order], cls[order]
    if task == "obb" and labels.get("obb") is not None and len(labels["obb"]):
        rb = xyxyxyxy2xywhr(labels["obb"])
        bboxes = rb  # replaces xyxy below

    n = min(len(bboxes), max_labels)
    nd = 5 if task == "obb" else 4
    out_boxes = np.zeros((max_labels, nd), np.float32)
    out_cls = np.zeros((max_labels,), np.int32)
    mask = np.zeros((max_labels,), bool)
    if n:
        b = bboxes[:n]
        if task == "obb":
            norm = np.asarray([w, h, w, h, 1.0], np.float32)
            out_boxes[:n] = b / norm
        else:
            out_boxes[:n] = np.stack(
                [
                    (b[:, 0] + b[:, 2]) / 2 / w,
                    (b[:, 1] + b[:, 3]) / 2 / h,
                    (b[:, 2] - b[:, 0]) / w,
                    (b[:, 3] - b[:, 1]) / h,
                ],
                axis=1,
            )
        out_cls[:n] = cls[:n].astype(np.int32)
        mask[:n] = True
    if task == "pose":
        nk, ndim = kpt_shape
        kp_out = np.zeros((max_labels, nk, ndim), np.float32)
        kp = labels.get("keypoints")
        if kp is not None and n:
            kp = kp[:n].astype(np.float32).copy()
            kp[..., 0] /= w
            kp[..., 1] /= h
            kp_out[:n] = kp[..., :ndim]
        out["keypoints"] = kp_out
    out.update(
        {
            "img": np.ascontiguousarray(img[..., ::-1]),  # BGR -> RGB, HWC uint8
            "bboxes": out_boxes,
            "cls": out_cls,
            "mask": mask,
        }
    )
    return out
