"""Two-stage "double inference": crop-and-refine second pass.

Rebuild of the reference's top-level ``double_inference.py`` (565 LoC):
first-pass detections above a confidence gate are re-inferred on padded
crops, refined boxes are mapped back and accepted only when they beat the
original under a combined score, then per-class NMS cleans up.

TPU-native shape: all crops of an image are letterboxed on host and batched
into ONE fixed-size device batch (the reference loops crops in batches of
4 with a thread pool sharing one CUDA model); the accept-gate and NMS are
small host-side numpy over <=max_det boxes.

Key constants mirror the reference: conf gate 0.25
(double_inference.py:44 CONF_THRESHOLD), 20% crop padding with 32 px
minimum (:100 calculate_optimal_crop_batch), letterbox to 640 (:125),
accept if same class + IoU>=0.25 + combined 0.6*conf+0.4*IoU best +
conf > original (:259-330), final per-class NMS IoU 0.45 (:159).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.data.augment import letterbox
from experiment_yolo_tpu.engine.results import Results
from experiment_yolo_tpu.ops import non_max_suppression
from experiment_yolo_tpu.utils.metrics import box_iou_np


@dataclass
class DoubleInferenceConfig:
    conf_threshold: float = 0.25  # first-pass gate
    pad_ratio: float = 0.2  # crop padding fraction
    min_pad: int = 32  # minimum padding in px
    crop_size: int = 640  # second-pass input size
    accept_iou: float = 0.25  # refined box must overlap original
    score_w_conf: float = 0.6  # combined score weights
    score_w_iou: float = 0.4
    final_nms_iou: float = 0.45
    max_crops: int = 16  # static second-pass batch per image


def calculate_optimal_crop(
    box: np.ndarray, img_shape: Tuple[int, int], pad_ratio: float = 0.2, min_pad: int = 32
) -> Tuple[int, int, int, int]:
    """Padded crop region for one xyxy box (reference :100)."""
    h, w = img_shape
    x1, y1, x2, y2 = box
    bw, bh = x2 - x1, y2 - y1
    pad_x = max(bw * pad_ratio, min_pad)
    pad_y = max(bh * pad_ratio, min_pad)
    cx1 = int(max(0, np.floor(x1 - pad_x)))
    cy1 = int(max(0, np.floor(y1 - pad_y)))
    cx2 = int(min(w, np.ceil(x2 + pad_x)))
    cy2 = int(min(h, np.ceil(y2 + pad_y)))
    return cx1, cy1, cx2, cy2


def per_class_nms(boxes: np.ndarray, scores: np.ndarray, classes: np.ndarray, iou_thres: float = 0.45):
    """Greedy per-class NMS on host (reference :159 torchvision_nms)."""
    keep_all = []
    for c in np.unique(classes):
        idx = np.nonzero(classes == c)[0]
        b, s = boxes[idx], scores[idx]
        order = s.argsort()[::-1]
        keep = []
        while order.size:
            i = order[0]
            keep.append(idx[i])
            if order.size == 1:
                break
            ious = box_iou_np(b[i : i + 1], b[order[1:]])[0]
            order = order[1:][ious <= iou_thres]
        keep_all.extend(keep)
    return np.asarray(sorted(keep_all), int)


class DoubleInference:
    """Runs the refine pass over first-pass Results."""

    def __init__(self, model, variables, cfg: Optional[DoubleInferenceConfig] = None):
        self.model = model
        self.variables = variables
        self.cfg = cfg or DoubleInferenceConfig()
        self._infer = jax.jit(self._infer_fn)

    def _infer_fn(self, variables, imgs):
        imgs = imgs.astype(jnp.float32) / 255.0  # normalize on device
        boxes, scores = self.model.predict(variables, imgs)
        return non_max_suppression(
            boxes, scores, conf_thres=0.05, iou_thres=0.7, max_det=32, multi_label=False
        )

    def refine(self, result: Results) -> Results:
        """Second pass for one image's Results; returns refined Results."""
        cfg = self.cfg
        img = result.orig_img
        h, w = img.shape[:2]
        data = result.boxes.data.copy()
        if len(data) == 0:
            return result
        gate = data[:, 4] >= cfg.conf_threshold
        idxs = np.nonzero(gate)[0][: cfg.max_crops]
        if idxs.size == 0:
            return result

        crops, metas = [], []
        for i in idxs:
            cx1, cy1, cx2, cy2 = calculate_optimal_crop(data[i, :4], (h, w), cfg.pad_ratio, cfg.min_pad)
            crop = img[cy1:cy2, cx1:cx2]
            lb, gain, (padw, padh) = letterbox(crop, (cfg.crop_size, cfg.crop_size))
            crops.append(lb[..., ::-1])  # BGR->RGB
            metas.append((cx1, cy1, gain, padw, padh))

        batch = np.zeros((cfg.max_crops, cfg.crop_size, cfg.crop_size, 3), np.uint8)
        batch[: len(crops)] = np.stack(crops)
        det, counts = jax.device_get(self._infer(self.variables, jnp.asarray(batch)))

        refined = data.copy()
        for k, i in enumerate(idxs):
            n = int(counts[k])
            if n == 0:
                continue
            cx1, cy1, gain, padw, padh = metas[k]
            cand = det[k, :n].copy()
            # crop letterbox -> original coords
            cand[:, [0, 2]] = (cand[:, [0, 2]] - padw) / gain + cx1
            cand[:, [1, 3]] = (cand[:, [1, 3]] - padh) / gain + cy1
            orig_box = data[i, :4][None]
            same_cls = cand[:, 5] == data[i, 5]
            ious = box_iou_np(cand[:, :4], orig_box)[:, 0]
            ok = same_cls & (ious >= cfg.accept_iou) & (cand[:, 4] > data[i, 4])
            if not ok.any():
                continue
            combined = cfg.score_w_conf * cand[:, 4] + cfg.score_w_iou * ious
            combined = np.where(ok, combined, -1.0)
            best = int(combined.argmax())
            refined[i, :5] = cand[best, :5]

        keep = per_class_nms(refined[:, :4], refined[:, 4], refined[:, 5], cfg.final_nms_iou)
        refined = refined[keep]
        refined[:, [0, 2]] = refined[:, [0, 2]].clip(0, w)
        refined[:, [1, 3]] = refined[:, [1, 3]].clip(0, h)
        return Results(result.orig_img, result.path, result.names, refined, speed=result.speed)

    def __call__(self, results: List[Results]) -> List[Results]:
        return [self.refine(r) for r in results]
