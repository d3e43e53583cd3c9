"""Detection validator: eval loop -> NMS -> IoU matching -> DetMetrics.

Rebuild of the reference's ``BaseValidator`` (engine/validator.py:37) +
``DetectionValidator`` (models/yolo/detect/val.py:17). The device part
(forward + decode + multi-label NMS) is one jitted program; matching and AP
accumulate on host in original-image space (scale_boxes semantics of
``utils/ops.py:89``), mirroring the reference's metric pipeline so mAP
numbers are comparable.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.cfg import get_cfg
from experiment_yolo_tpu.data import DataLoader, build_yolo_dataset, check_det_dataset
from experiment_yolo_tpu.ops import non_max_suppression
from experiment_yolo_tpu.utils import LOGGER
from experiment_yolo_tpu.utils.metrics import DetMetrics, IOUV, box_iou_np, match_predictions


class DetectionValidator:
    def __init__(self, args: Optional[Dict] = None):
        self.args = get_cfg(overrides=args or {})
        if self.args.conf is None:
            self.args.conf = 0.001
        # memoized per-model state: dataset/loader scan and the jitted
        # forward+NMS closure survive across calls, so the trainer's
        # per-epoch EMA validation costs no re-scan and no re-trace
        self._cache_key = None
        self._dataset = None
        self._loader = None
        self._infer = None

    def _setup(self, model):
        args = self.args
        from experiment_yolo_tpu.cfg import check_imgsz

        args.imgsz = check_imgsz(int(args.imgsz), max(model.strides))
        data = check_det_dataset(args.data)
        key = (id(model), str(args.data), int(args.imgsz), int(args.batch))
        if self._cache_key == key:
            return data, self._dataset, self._loader, self._infer
        split = data.get(args.split or "val") or data["val"]
        if getattr(model, "batch", None):
            # exported artifacts bake batch/imgsz and can't take rect's
            # variable shapes
            args.batch = int(model.batch)
            args.rect = False
            in_sh = getattr(model.backend, "input_shape", None)
            if in_sh and isinstance(in_sh[1], int):
                args.imgsz = int(in_sh[1])
        dataset = build_yolo_dataset(args, split, mode="val")
        loader = DataLoader(
            dataset, args.batch, shuffle=False, workers=args.workers, drop_last=False,
            rect=bool(args.rect), stride=max(model.strides),
        )

        is_rtdetr = getattr(model, "head_type", "") == "RTDETRDecoder"
        is_backend = hasattr(model, "forward_host")  # exported artifact

        def _forward(variables, imgs):
            imgs = imgs.astype(jnp.float32) / 255.0  # normalize on device
            return model.predict(variables, imgs)

        @jax.jit
        def postprocess(boxes, scores):
            if is_rtdetr:
                # reference RT-DETR val protocol (models/rtdetr/val.py:
                # postprocess): NO NMS, NO conf threshold — all nq queries,
                # best class each, sorted by confidence
                from experiment_yolo_tpu.ops.boxes import xywh2xyxy

                conf = scores.max(-1)
                cls = scores.argmax(-1).astype(jnp.float32)
                order = jnp.argsort(-conf, axis=1)
                xyxy = xywh2xyxy(boxes)
                det = jnp.concatenate([xyxy, conf[..., None], cls[..., None]], -1)
                det = jnp.take_along_axis(det, order[..., None], axis=1)
                nq = det.shape[1]
                counts = jnp.full((det.shape[0],), nq, jnp.int32)
                return det, counts
            return non_max_suppression(
                boxes,
                scores,
                conf_thres=float(args.conf),
                iou_thres=float(args.iou),
                max_det=int(args.max_det),
                multi_label=True,
                # wider candidate pool at val conf 0.001 (the reference's
                # max_nms is 30000; 4096 covers every real image here)
                pre_nms_topk=4096,
                nms_type=str(getattr(args, "nms_type", "soft") or "soft"),
                soft_first_quirk=bool(getattr(args, "soft_nms_quirk", False)),
            )

        if is_backend:
            def infer(variables, imgs):
                boxes, scores = model.forward_host(np.asarray(imgs))
                return postprocess(jnp.asarray(boxes), jnp.asarray(scores))
        else:
            infer = jax.jit(
                lambda variables, imgs: postprocess(*_forward(variables, imgs))
            )

        self._cache_key, self._dataset, self._loader, self._infer = key, dataset, loader, infer
        return data, dataset, loader, infer

    def __call__(self, model, variables) -> Dict[str, float]:
        args = self.args
        data, dataset, loader, infer = self._setup(model)
        order = loader.image_order()
        metrics = DetMetrics(data["names"])
        cm = None
        if getattr(args, "plots", False):
            from experiment_yolo_tpu.utils.metrics import ConfusionMatrix

            # reference metrics.py:912: 0.25 when conf is unset/val-default
            c = args.conf
            cm = ConfusionMatrix(nc=len(data["names"]),
                                 conf=0.25 if c in (None, 0.001) else float(c))

        n_images = len(dataset)
        seen = 0
        t0 = time.time()
        json_dets = []  # COCO-style records when save_json (detect/val.py:261)
        for batch in loader:
            imgs = jnp.asarray(batch["img"])  # uint8; normalized on device
            det, counts = jax.device_get(infer(variables, imgs))
            bs = imgs.shape[0]
            for i in range(bs):
                if seen >= n_images:
                    break  # padded tail of last batch
                seen += 1
                n = int(counts[i])
                d = det[i, :n]  # (n, 6) letterbox space
                gain, padw, padh = batch["ratio_pad"][i]
                oh, ow = batch["ori_shape"][i]
                # predictions -> original space
                pb = d[:, :4].copy()
                pb[:, [0, 2]] = (pb[:, [0, 2]] - padw) / gain
                pb[:, [1, 3]] = (pb[:, [1, 3]] - padh) / gain
                pb[:, [0, 2]] = pb[:, [0, 2]].clip(0, ow)
                pb[:, [1, 3]] = pb[:, [1, 3]].clip(0, oh)
                # gt (normalized xywh on letterboxed img) -> original space
                m = batch["mask"][i]
                gtn = batch["bboxes"][i][m]
                cls = batch["cls"][i][m].astype(np.float32)
                imgsz_h, imgsz_w = imgs.shape[1:3]
                gx = gtn * np.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h])
                gt = np.stack(
                    [
                        gx[:, 0] - gx[:, 2] / 2,
                        gx[:, 1] - gx[:, 3] / 2,
                        gx[:, 0] + gx[:, 2] / 2,
                        gx[:, 1] + gx[:, 3] / 2,
                    ],
                    1,
                )
                gt[:, [0, 2]] = (gt[:, [0, 2]] - padw) / gain
                gt[:, [1, 3]] = (gt[:, [1, 3]] - padh) / gain
                if n == 0:
                    tp = np.zeros((0, IOUV.size), bool)
                else:
                    iou = box_iou_np(pb, gt)
                    tp = match_predictions(d[:, 5], cls, iou)
                metrics.update(tp, d[:, 4], d[:, 5], cls)
                if cm is not None:
                    cm.process_batch(
                        np.concatenate([pb, d[:, 4:6]], 1) if n else None, gt, cls
                    )
                if args.save_json:
                    from pathlib import Path as _P

                    stem = _P(dataset.im_files[int(order[seen - 1])]).stem
                    for k in range(n):
                        json_dets.append(
                            {
                                "image_id": stem,
                                "category_id": int(d[k, 5]),
                                "bbox": [  # COCO xywh (top-left)
                                    float(pb[k, 0]),
                                    float(pb[k, 1]),
                                    float(pb[k, 2] - pb[k, 0]),
                                    float(pb[k, 3] - pb[k, 1]),
                                ],
                                "score": float(d[k, 4]),
                            }
                        )
        if args.save_json:
            import json
            from pathlib import Path as _P

            out = _P(args.project or "runs/detect") / "predictions.json"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(json.dumps(json_dets))
            LOGGER.info(f"val: saved {len(json_dets)} detections to {out}")
        stats = metrics.result()
        if cm is not None:
            from pathlib import Path as _P

            sd = _P(args.project or "runs/detect")
            written = metrics.plot(sd)  # PR/F1/P/R curves (metrics.py:1060)
            written.append(cm.plot(sd / "confusion_matrix.png", data["names"]))
            LOGGER.info(f"val: saved {len(written)} figures to {sd}")
        dt = time.time() - t0
        if getattr(args, "verbose", True):
            LOGGER.info(
                f"val: {seen} images  P {stats['precision']:.3f}  R {stats['recall']:.3f}  "
                f"mAP50 {stats['mAP50']:.3f}  mAP50-95 {stats['mAP50-95']:.3f}  ({seen / max(dt, 1e-9):.1f} img/s)"
            )
        return stats
