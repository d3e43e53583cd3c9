"""Sliced (SAHI-style) inference: slice grid -> ONE batched forward -> global NMS.

TPU-native counterpart of the reference's SAHI example
(examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py:52 —
``get_sliced_prediction(frame, model, slice_height=512, slice_width=512,
overlap_height_ratio=0.2, overlap_width_ratio=0.2)`` via the external
``sahi`` library). Instead of looping slices through the model one at a
time (sahi's host loop), every slice of a frame is stacked into a single
batch so the whole frame is ONE XLA program: batched forward on the MXU,
slice-offset merge on device, and a single global NMS over all slices
(+ the optional full-image pass, sahi's ``perform_standard_pred``).

Slice grids are computed on host per image shape; the device program is
compiled once per (n_slices, slice) and cached by jit.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data.augment import letterbox
from experiment_yolo_tpu.engine.predictor import load_source
from experiment_yolo_tpu.engine.results import Results
from experiment_yolo_tpu.ops import non_max_suppression


def slice_grid(h: int, w: int, slice: int, overlap: float) -> List[Tuple[int, int]]:
    """(y0, x0) slice origins covering an h x w image with >= overlap ratio.

    Matches sahi's tiling: fixed stride ``slice * (1 - overlap)``, last
    slice flush with the image edge (clamped to 0 for images smaller than
    the slice, which then get zero-padding at extraction time).
    """
    step = max(int(slice * (1.0 - overlap)), 1)

    def starts(extent: int) -> List[int]:
        if extent <= slice:
            return [0]
        s = list(range(0, extent - slice + 1, step))
        if s[-1] != extent - slice:
            s.append(extent - slice)
        return s

    return [(y, x) for y in starts(h) for x in starts(w)]


def nms_max_wh(h: int, w: int) -> float:
    """Class-offset magnitude for NMS in original-image pixels: must exceed
    the largest image dimension or boxes of adjacent classes collide after
    the cls*max_wh shift (ops/nms.py:97). Doubles from the 7680 default so
    jit sees few distinct static values."""
    mwh = 7680.0
    while mwh <= max(h, w):
        mwh *= 2
    return mwh


class SlicedPredictor:
    """Small-object detection by slicing: the DEAL-YOLO use case (aerial
    wildlife) is exactly where sliced inference shines — tiny objects that
    vanish at 640 full-frame resolution survive at native slice resolution."""

    def __init__(self, model, variables, overrides: Optional[Dict] = None,
                 slice: int = 512, overlap: float = 0.2, include_full: bool = True):
        self.args = get_cfg(overrides=overrides or {})
        if self.args.conf is None:
            self.args.conf = 0.25
        from experiment_yolo_tpu.cfg import check_imgsz

        self.model = model
        self.variables = variables
        self.slice = check_imgsz(int(slice), max(model.strides))
        self.overlap = float(overlap)
        self.include_full = bool(include_full)
        self.imgsz = check_imgsz(int(self.args.imgsz), max(model.strides))
        self._infer = jax.jit(self._infer_fn, static_argnames=("max_wh",))

    # ------------------------------------------------------------------
    def _infer_fn(self, variables, slices_u8, offsets, full_u8, gain, pad,
                  max_wh: float = 7680.0):
        """slices (N,s,s,3) u8 + per-slice origins (N,2) [x0,y0];
        full (1,imgsz,imgsz,3) u8 letterboxed + its (gain, (padw,padh)).
        Returns (det (1,max_det,6), count (1,)) in ORIGINAL image pixels."""
        x = slices_u8.astype(jnp.float32) / 255.0
        boxes, scores = self.model.predict(variables, x)  # (N,A,4) xywh,(N,A,nc)
        # slice -> global px: xywh centers shift by the slice origin; w/h keep
        shift = jnp.concatenate([offsets, jnp.zeros_like(offsets)], axis=-1)
        boxes = boxes + shift[:, None, :]
        n, a, nc = scores.shape
        boxes = boxes.reshape(1, n * a, 4)
        scores = scores.reshape(1, n * a, nc)
        if full_u8 is not None:
            xf = full_u8.astype(jnp.float32) / 255.0
            fb, fs = self.model.predict(variables, xf)  # (1,Af,4) xywh,(1,Af,nc)
            # undo the letterbox affine so full-image boxes land in the same
            # global pixel frame as the slices (centers un-pad; all /gain)
            fb = (fb - jnp.concatenate([pad, jnp.zeros_like(pad)])[None, None, :]) / gain
            boxes = jnp.concatenate([boxes, fb], axis=1)
            scores = jnp.concatenate([scores, fs], axis=1)
        return non_max_suppression(
            boxes,
            scores,
            conf_thres=float(self.args.conf),
            iou_thres=float(self.args.iou),
            max_det=int(self.args.max_det),
            multi_label=False,
            agnostic=bool(self.args.agnostic_nms),
            max_wh=max_wh,
            nms_type=str(getattr(self.args, "nms_type", "soft") or "soft"),
            soft_first_quirk=bool(getattr(self.args, "soft_nms_quirk", False)),
        )

    # ------------------------------------------------------------------
    def _prepare(self, img: np.ndarray):
        h, w = img.shape[:2]
        s = self.slice
        grid = slice_grid(h, w, s, self.overlap)
        slices = np.zeros((len(grid), s, s, 3), np.uint8)
        offsets = np.zeros((len(grid), 2), np.float32)  # (x0, y0)
        rgb = img[..., ::-1]  # BGR -> RGB once
        for i, (y0, x0) in enumerate(grid):
            tile = rgb[y0:y0 + s, x0:x0 + s]
            slices[i, :tile.shape[0], :tile.shape[1]] = tile
            offsets[i] = (x0, y0)
        full = gain = pad = None
        if self.include_full:
            fimg, g, (pw, ph) = letterbox(img, (self.imgsz, self.imgsz))
            full = fimg[None, ..., ::-1].copy()
            gain = np.float32(g)
            pad = np.asarray([pw, ph], np.float32)
        return slices, offsets, full, gain, pad

    def __call__(self, source, stream: bool = False):
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def stream_inference(self, source):
        names = self.model.names
        for path, img in load_source(source, vid_stride=int(getattr(self.args, "vid_stride", 1) or 1)):
            t0 = time.time()
            slices, offsets, full, gain, pad = self._prepare(img)
            t1 = time.time()
            mwh = nms_max_wh(*img.shape[:2])
            det, counts = jax.device_get(
                self._infer(self.variables, jnp.asarray(slices), jnp.asarray(offsets),
                            None if full is None else jnp.asarray(full),
                            0.0 if gain is None else gain,
                            jnp.zeros((2,), jnp.float32) if pad is None else jnp.asarray(pad),
                            max_wh=mwh)
            )
            t2 = time.time()
            n = int(counts[0])
            d = det[0, :n].copy()
            oh, ow = img.shape[:2]
            d[:, [0, 2]] = d[:, [0, 2]].clip(0, ow)
            d[:, [1, 3]] = d[:, [1, 3]].clip(0, oh)
            if self.args.classes is not None:
                keep = np.isin(d[:, 5].astype(int), np.atleast_1d(self.args.classes))
                d = d[keep]
            yield Results(
                img, path, names, d,
                speed={"preprocess": (t1 - t0) * 1000,
                       "inference": (t2 - t1) * 1000},
            )
