"""FastSAM + YOLO-NAS facades (reference models/fastsam/, models/nas/).

FastSAM is YOLOv8-seg run class-agnostic with an "everything" postprocess
(fastsam/predict.py:FastSAMPredictor): single-class NMS, a synthetic
full-image box replacing any near-full-frame detection, then point/box
prompt filtering over the resulting masks (fastsam/prompt.py).

YOLO-NAS in the reference is a thin wrapper around super_gradients'
pretrained torch model — the architecture is NOT in the reference repo
(nas/model.py:52 loads it from torch hub). The NAS facade here mirrors
that contract around any of our detection checkpoints: class-agnostic-off,
no-multilabel xyxy postprocess (nas/predict.py:43).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.ops import non_max_suppression


class FastSAMPredictor:
    """Everything-mode segmentation (reference fastsam/predict.py).

    Wraps a SegmentationModel: class-agnostic single-class NMS, full-frame
    box substitution, mask assembly; ``prompt`` filters results by boxes /
    points (fastsam/prompt.py box_prompt/point_prompt).
    """

    def __init__(self, model, variables, conf: float = 0.4, iou: float = 0.9, max_det: int = 300):
        self.model = model
        self.variables = variables
        self.conf, self.iou, self.max_det = conf, iou, max_det
        self._infer = jax.jit(self._infer_fn)

    def _infer_fn(self, variables, imgs):
        imgs = imgs.astype(jnp.float32) / 255.0
        boxes, scores, coeffs, protos = self.model.predict(variables, imgs)
        # single-class: max over classes (SAM has no class semantics)
        sc = scores.max(-1, keepdims=True)
        det, counts, idx = non_max_suppression(
            boxes, sc, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det,
            agnostic=True, return_idx=True,
        )
        b = imgs.shape[0]
        sel_coeffs = jnp.take_along_axis(coeffs, idx[..., None], axis=1)
        from experiment_yolo_tpu.nn.heads_extra import assemble_masks

        masks = assemble_masks(sel_coeffs, protos)  # (B, max_det, Hp, Wp)
        return det, counts, masks

    def __call__(self, img: np.ndarray):
        """img: (H, W, 3) uint8 BGR, already sized to the model imgsz.
        Returns dict(boxes (n,6), masks (n, Hp, Wp) bool)."""
        h, w = img.shape[:2]
        det, counts, masks = jax.device_get(self._infer(self.variables, jnp.asarray(img[None, ..., ::-1].copy())))
        n = int(counts[0])
        det, masks = np.array(det[0][:n]), masks[0][:n] > 0.5
        # full-frame detection substitution (predict.py:55-63): any box with
        # IoU > 0.9 against the whole frame becomes the exact frame box
        if n:
            area = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
            iou_full = area / (h * w)
            det[iou_full > 0.9, :4] = np.asarray([0, 0, w, h], np.float32)
        return {"boxes": det, "masks": masks}

    # -- prompts (fastsam/prompt.py) ----------------------------------------
    @staticmethod
    def box_prompt(results: dict, box_xyxy: Sequence[float]) -> dict:
        """Keep the mask with max IoU against the prompt box."""
        masks = results["masks"]
        if not len(masks):
            return results
        bx = np.asarray(box_xyxy)
        mask_areas = masks.sum((1, 2))
        x1, y1, x2, y2 = (int(v) for v in bx)
        inter = masks[:, y1:y2, x1:x2].sum((1, 2))
        union = mask_areas + (y2 - y1) * (x2 - x1) - inter
        best = int(np.argmax(inter / np.maximum(union, 1)))
        return {"boxes": results["boxes"][best : best + 1], "masks": masks[best : best + 1]}

    @staticmethod
    def point_prompt(results: dict, points: Sequence[Sequence[float]], labels: Sequence[int]) -> dict:
        """Keep masks containing every positive point and no negative one."""
        masks = results["masks"]
        if not len(masks):
            return results
        keep = np.ones(len(masks), bool)
        for (x, y), lab in zip(points, labels):
            inside = masks[:, int(y), int(x)]
            keep &= inside if lab == 1 else ~inside
        return {"boxes": results["boxes"][keep], "masks": masks[keep]}


class NAS:
    """YOLO-NAS facade (reference nas/model.py): predict/val around a
    detection checkpoint with the NAS postprocess — xyxy boxes already
    decoded, single-label, no multi-label expansion (nas/predict.py:43)."""

    def __init__(self, ckpt_or_model, variables: Optional[dict] = None):
        if isinstance(ckpt_or_model, (str,)) or hasattr(ckpt_or_model, "__fspath__"):
            from experiment_yolo_tpu.engine.checkpoint import load_checkpoint

            self.model, self.variables = load_checkpoint(ckpt_or_model)
        else:
            self.model, self.variables = ckpt_or_model, variables

    def predict(self, source, **overrides):
        from experiment_yolo_tpu.engine.predictor import DetectionPredictor

        overrides.setdefault("conf", 0.25)
        return DetectionPredictor(self.model, self.variables, overrides=overrides)(source)

    def val(self, data, **overrides):
        from experiment_yolo_tpu.engine.validator import DetectionValidator

        v = DetectionValidator(args={"data": data, **overrides})
        return v(self.model, self.variables)

    def info(self):
        return self.model.info(self.variables)
