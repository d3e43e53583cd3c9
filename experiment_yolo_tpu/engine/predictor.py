"""Detection predictor: source -> letterbox -> one jitted XLA program -> Results.

Rebuild of the reference's ``BasePredictor`` (engine/predictor.py:60) +
``DetectionPredictor`` (models/yolo/detect/predict.py:8). The device path
(normalize -> backbone -> decode -> NMS) is a single jit; only JPEG decode,
letterbox and drawing stay on host. Batch shape is fixed (pad the last
batch) so there is exactly one compilation per (batch, imgsz).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data.augment import letterbox
from experiment_yolo_tpu.data.dataset import IMG_FORMATS
from experiment_yolo_tpu.engine.results import Results
from experiment_yolo_tpu.ops import non_max_suppression
from experiment_yolo_tpu.utils import LOGGER

Source = Union[str, Path, np.ndarray, List]


def load_source(source: Source) -> List[tuple]:
    """Resolve a source to [(path, BGR image), ...] (reference data/loaders.py)."""
    if isinstance(source, (list, tuple)):
        out = []
        for s in source:
            out.extend(load_source(s))
        return out
    if isinstance(source, np.ndarray):
        return [("array", source)]
    p = Path(source)
    if p.is_dir():
        files = sorted(f for f in p.rglob("*") if f.suffix.lstrip(".").lower() in IMG_FORMATS)
        if not files:
            raise FileNotFoundError(f"no images in {p}")
        return [(str(f), cv2.imread(str(f))) for f in files]
    if p.is_file():
        img = cv2.imread(str(p))
        if img is None:
            raise ValueError(f"could not read image {p}")
        return [(str(p), img)]
    raise FileNotFoundError(f"source {source} not found")


class DetectionPredictor:
    def __init__(self, model, variables, overrides: Optional[Dict] = None):
        self.args = get_cfg(overrides=overrides or {})
        if self.args.conf is None:
            self.args.conf = 0.25
        self.model = model
        self.variables = variables
        from experiment_yolo_tpu.cfg import check_imgsz

        self.imgsz = check_imgsz(int(self.args.imgsz), max(model.strides))
        self.batch = max(int(self.args.batch), 1)
        self._infer = jax.jit(self._infer_fn)

    def _infer_fn(self, variables, imgs):
        # uint8 in, normalize on device: 4x less host->device traffic and
        # the cast/divide fuses into the first conv's input pass
        imgs = imgs.astype(jnp.float32) / 255.0
        boxes, scores = self.model.predict(variables, imgs)
        return non_max_suppression(
            boxes,
            scores,
            conf_thres=float(self.args.conf),
            iou_thres=float(self.args.iou),
            max_det=int(self.args.max_det),
            multi_label=False,
            agnostic=bool(self.args.agnostic_nms),
        )

    def _preprocess_chunk(self, chunk):
        pre = [letterbox(img, (self.imgsz, self.imgsz)) for _, img in chunk]
        batch_np = np.stack([p[0][..., ::-1] for p in pre])  # BGR->RGB
        n_pad = self.batch - len(chunk)
        if n_pad:
            batch_np = np.concatenate([batch_np, np.zeros((n_pad, *batch_np.shape[1:]), batch_np.dtype)])
        return pre, batch_np

    def __call__(self, source: Source) -> List[Results]:
        items = load_source(source)
        names = self.model.names
        results: List[Results] = []
        bs = self.batch
        chunks = [items[s : s + bs] for s in range(0, len(items), bs)]
        # software pipeline: device inference for chunk i runs while the host
        # letterboxes chunk i+1 (JAX dispatch is async; device_get happens at
        # consume time) — the reference's dataloader-worker overlap, inline
        pending = []  # (chunk, pre, async device result, t0, t1)
        for ci, chunk in enumerate(chunks + [None]):
            if chunk is not None:
                t0 = time.time()
                pre, batch_np = self._preprocess_chunk(chunk)
                t1 = time.time()
                fut = self._infer(self.variables, jnp.asarray(batch_np))
                pending.append((chunk, pre, fut, t0, t1))
            if chunk is None or len(pending) > 1:
                chunk_i, pre, fut, t0, t1 = pending.pop(0)
                det, counts = jax.device_get(fut)
                t2 = time.time()
                results.extend(self._postprocess(chunk_i, pre, det, counts, names, t0, t1, t2))
        return results

    def _postprocess(self, chunk, pre, det, counts, names, t0, t1, t2):
        results = []
        for i, ((path, orig), (pimg, gain, (padw, padh))) in enumerate(zip(chunk, pre)):
            n = int(counts[i])
            d = det[i, :n].copy()
            oh, ow = orig.shape[:2]
            d[:, [0, 2]] = ((d[:, [0, 2]] - padw) / gain).clip(0, ow)
            d[:, [1, 3]] = ((d[:, [1, 3]] - padh) / gain).clip(0, oh)
            if self.args.classes is not None:
                keep = np.isin(d[:, 5].astype(int), np.atleast_1d(self.args.classes))
                d = d[keep]
            results.append(
                Results(
                    orig,
                    path,
                    names,
                    d,
                    speed={
                        "preprocess": (t1 - t0) * 1000 / len(chunk),
                        "inference": (t2 - t1) * 1000 / len(chunk),
                    },
                )
            )
        return results
