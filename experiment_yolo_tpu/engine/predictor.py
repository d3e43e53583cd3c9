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

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data.augment import letterbox
from experiment_yolo_tpu.engine.results import Results
from experiment_yolo_tpu.ops import non_max_suppression
from experiment_yolo_tpu.utils import LOGGER

Source = Union[str, Path, np.ndarray, List]


def load_source(source: Source, vid_stride: int = 1):
    """Resolve a source into a frame iterator of (label, BGR image) pairs.

    Images, directories, video files (frame-by-frame), and live streams
    (webcam index / RTSP / *.streams) all flow through here — the rebuild
    of the reference's load_inference_source (data/build.py:153) over
    data/loaders.py.
    """
    from experiment_yolo_tpu.data import loaders

    if loaders.is_stream_source(source):
        streams = loaders.LoadStreams(source, vid_stride=vid_stride)

        def gen():
            try:
                for tick in streams:
                    for label, frame, _meta in tick:
                        yield label, frame
            finally:
                streams.close()

        return gen()
    return ((label, frame) for label, frame, _meta in loaders.iter_images_and_videos(source, vid_stride))


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
        if getattr(model, "batch", None):
            self.batch = int(model.batch)  # exported artifacts bake the batch
        in_sh = getattr(getattr(model, "backend", None), "input_shape", None)
        if in_sh and isinstance(in_sh[1], int):
            self.imgsz = int(in_sh[1])  # ...and the image size
        self._spatial_sh = None
        sp = int(getattr(self.args, "spatial", 0) or 0)
        if sp > 1:
            if hasattr(model, "forward_host"):
                raise ValueError("spatial partitioning needs a native (jit) model, "
                                 "not an exported-artifact backend")
            # Product surface for parallel/spatial.py: shard image rows over an
            # N-way 'spatial' mesh axis; GSPMD partitions every conv with halo
            # exchanges, so outputs are EXACT (unlike sliced_predict's seams).
            from experiment_yolo_tpu.parallel import spatial as splib
            from experiment_yolo_tpu.parallel.mesh import replicate

            n_dev = len(jax.devices())
            if n_dev % sp:
                raise ValueError(
                    f"spatial={sp} needs a device count divisible by it; have {n_dev}")
            mesh = splib.make_mesh_spatial(n_dev // sp, sp)
            splib._check_divisible(self.imgsz, mesh, int(max(model.strides)))
            self.variables = replicate(self.variables, mesh)
            self._spatial_sh = splib.image_sharding(mesh)
        if hasattr(model, "forward_host"):
            # exported artifact (AutoBackend): host forward + jitted NMS
            self._nms = jax.jit(self._nms_fn)
            self._infer = self._infer_backend
        else:
            self._infer = jax.jit(self._infer_fn)

    def _nms_fn(self, boxes, scores, return_idx: bool = False):
        return non_max_suppression(
            boxes,
            scores,
            conf_thres=float(self.args.conf),
            iou_thres=float(self.args.iou),
            max_det=int(self.args.max_det),
            multi_label=False,
            agnostic=bool(self.args.agnostic_nms),
            nms_type=str(getattr(self.args, "nms_type", "soft") or "soft"),
            soft_first_quirk=bool(getattr(self.args, "soft_nms_quirk", False)),
            return_idx=return_idx,
        )

    def _infer_fn(self, variables, imgs):
        # uint8 in, normalize on device: 4x less host->device traffic and
        # the cast/divide fuses into the first conv's input pass
        imgs = imgs.astype(jnp.float32) / 255.0
        if self._spatial_sh is not None:
            imgs = jax.lax.with_sharding_constraint(imgs, self._spatial_sh)
        task = getattr(self.model, "task", "detect")
        if task == "segment":
            from experiment_yolo_tpu.nn.heads_extra import assemble_masks

            boxes, scores, coeffs, protos = self.model.predict(variables, imgs)
            det, counts, idx = self._nms_fn(boxes, scores, return_idx=True)
            kept = jnp.take_along_axis(coeffs, idx[..., None], axis=1)
            masks = assemble_masks(kept, protos)  # (B, max_det, Hp, Wp) probs
            return det, counts, masks
        if task == "pose":
            boxes, scores, kpts = self.model.predict(variables, imgs)
            det, counts, idx = self._nms_fn(boxes, scores, return_idx=True)
            kept = jnp.take_along_axis(kpts, idx[..., None, None], axis=1)
            return det, counts, kept
        if task == "obb":
            from experiment_yolo_tpu.ops.nms import nms_rotated

            rboxes, scores = self.model.predict(variables, imgs)
            det7, counts = nms_rotated(
                rboxes, scores, conf_thres=float(self.args.conf),
                iou_thres=float(self.args.iou), max_det=int(self.args.max_det),
            )
            return det7, counts
        if task == "classify":
            probs = self.model.predict(variables, imgs)  # (B, nc)
            return probs, jnp.zeros((probs.shape[0],), jnp.int32)
        boxes, scores = self.model.predict(variables, imgs)
        return self._nms_fn(boxes, scores)

    def _infer_backend(self, variables, imgs):
        boxes, scores = self.model.forward_host(np.asarray(imgs))
        return self._nms(jnp.asarray(boxes), jnp.asarray(scores))

    def _preprocess_chunk(self, chunk):
        pre = [letterbox(img, (self.imgsz, self.imgsz)) for _, img in chunk]
        batch_np = np.stack([p[0][..., ::-1] for p in pre])  # BGR->RGB
        n_pad = self.batch - len(chunk)
        if n_pad:
            batch_np = np.concatenate([batch_np, np.zeros((n_pad, *batch_np.shape[1:]), batch_np.dtype)])
        return pre, batch_np

    def __call__(self, source: Source, stream: bool = False):
        """Run inference. Returns a list of Results, or a lazy generator with
        ``stream=True`` (reference stream_inference, predictor.py:243) —
        required for unbounded sources (live streams, long videos)."""
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def stream_inference(self, source: Source):
        frames = load_source(source, vid_stride=int(getattr(self.args, "vid_stride", 1) or 1))
        names = self.model.names
        bs = self.batch

        def chunks():
            chunk = []
            for item in frames:
                chunk.append(item)
                if len(chunk) == bs:
                    yield chunk
                    chunk = []
            if chunk:
                yield chunk

        # software pipeline: device inference for chunk i runs while the host
        # letterboxes chunk i+1 (JAX dispatch is async; device_get happens at
        # consume time) — the reference's dataloader-worker overlap, inline
        pending = []  # (chunk, pre, async device result, t0, t1)

        def flush():
            chunk_i, pre, fut, t0, t1 = pending.pop(0)
            out = jax.device_get(fut)
            det, counts, extra = out[0], out[1], (out[2] if len(out) > 2 else None)
            t2 = time.time()
            return self._postprocess(chunk_i, pre, det, counts, names, t0, t1, t2,
                                     extra=extra)

        backend = hasattr(self.model, "forward_host")
        for chunk in chunks():
            t0 = time.time()
            pre, batch_np = self._preprocess_chunk(chunk)
            t1 = time.time()
            # backend path consumes the numpy batch directly (the artifact
            # runtime is host-side; uploading just to pull back would add a
            # blocking HtoD+DtoH round trip per chunk)
            fut = self._infer(self.variables,
                              batch_np if backend else jnp.asarray(batch_np))
            pending.append((chunk, pre, fut, t0, t1))
            if len(pending) > 1:
                yield from flush()
        while pending:
            yield from flush()

    def _postprocess(self, chunk, pre, det, counts, names, t0, t1, t2, extra=None):
        task = getattr(self.model, "task", "detect")
        results = []
        for i, ((path, orig), (pimg, gain, (padw, padh))) in enumerate(zip(chunk, pre)):
            n = int(counts[i])
            d = det[i, :n].copy()
            oh, ow = orig.shape[:2]
            speed = {
                "preprocess": (t1 - t0) * 1000 / len(chunk),
                "inference": (t2 - t1) * 1000 / len(chunk),
            }
            if task == "classify":
                results.append(Results(orig, path, names, None, speed=speed,
                                       probs=det[i]))
                continue
            if task == "obb":
                # xywhr: rescale centers/extents, angle unchanged
                d[:, 0] = ((d[:, 0] - padw) / gain).clip(0, ow)
                d[:, 1] = ((d[:, 1] - padh) / gain).clip(0, oh)
                d[:, 2:4] = d[:, 2:4] / gain
                results.append(Results(orig, path, names, None, speed=speed, obb=d))
                continue
            d[:, [0, 2]] = ((d[:, [0, 2]] - padw) / gain).clip(0, ow)
            d[:, [1, 3]] = ((d[:, [1, 3]] - padh) / gain).clip(0, oh)
            keep = None
            if self.args.classes is not None:
                keep = np.isin(d[:, 5].astype(int), np.atleast_1d(self.args.classes))
                d = d[keep]
            masks = kpts = None
            if task == "segment" and extra is not None:
                masks = self._masks_to_orig(extra[i, :n], d, gain, padw, padh, oh, ow,
                                            keep)
            elif task == "pose" and extra is not None:
                k = extra[i, :n].copy()  # (n, nk, 2|3) letterbox px
                if keep is not None:
                    k = k[keep]
                k[..., 0] = ((k[..., 0] - padw) / gain).clip(0, ow)
                k[..., 1] = ((k[..., 1] - padh) / gain).clip(0, oh)
                kpts = k
            results.append(
                Results(orig, path, names, d, speed=speed, masks=masks, keypoints=kpts)
            )
        return results

    def _masks_to_orig(self, mask_probs, d, gain, padw, padh, oh, ow, keep):
        """Proto-resolution mask probs -> original-space bool masks cropped
        to their boxes (reference ops.process_mask + scale_masks)."""
        import cv2

        if keep is not None:
            mask_probs = mask_probs[keep]
        out = np.zeros((len(d), oh, ow), bool)
        top, left = int(round(padh)), int(round(padw))
        nh, nw = int(round(oh * gain)), int(round(ow * gain))
        for j, m in enumerate(np.asarray(mask_probs, np.float32)):
            # upsample proto grid -> letterbox square, strip pad, -> original
            up = cv2.resize(m, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
            crop = up[top: top + nh, left: left + nw]
            full = cv2.resize(crop, (ow, oh), interpolation=cv2.INTER_LINEAR) > 0.5
            x1, y1, x2, y2 = d[j, :4].astype(int)
            box_mask = np.zeros_like(full)
            box_mask[max(y1, 0): y2, max(x1, 0): x2] = True
            out[j] = full & box_mask
        return out
