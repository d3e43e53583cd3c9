"""Segmentation / Pose / OBB validators.

Rebuilds of the reference task validators (models/yolo/segment/val.py,
pose/val.py, obb/val.py): the box path mirrors DetectionValidator
(jitted forward + NMS on device, host matching in original-image space);
the task branch adds a second TP matrix — mask IoU at proto resolution
(segment), OKS (pose), probiou (obb) — and reports both metric families.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.cfg import check_imgsz, get_cfg
from experiment_yolo_tpu.data import DataLoader, build_yolo_dataset, check_det_dataset
from experiment_yolo_tpu.ops import non_max_suppression
from experiment_yolo_tpu.ops.nms import nms_rotated
from experiment_yolo_tpu.utils import LOGGER
from experiment_yolo_tpu.utils.metrics import DetMetrics, IOUV, box_iou_np, match_predictions
from experiment_yolo_tpu.utils.task_losses import OKS_SIGMA


def mask_iou_np(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(N, HW) x (M, HW) binary masks -> (N, M) IoU (reference
    metrics.py:mask_iou)."""
    inter = pred.astype(np.float32) @ gt.astype(np.float32).T
    union = pred.sum(-1)[:, None] + gt.sum(-1)[None] - inter
    return inter / (union + eps)


def kpt_oks_np(pred_kpts: np.ndarray, gt_kpts: np.ndarray, gt_area: np.ndarray, sigmas: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """OKS matrix (N_pred, M_gt) (reference metrics.py:kpt_iou)."""
    d = ((pred_kpts[:, None, :, 0] - gt_kpts[None, :, :, 0]) ** 2
         + (pred_kpts[:, None, :, 1] - gt_kpts[None, :, :, 1]) ** 2)  # (N, M, nk)
    vis = gt_kpts[..., 2] != 0  # (M, nk)
    e = d / (2 * sigmas[None, None]) ** 2 / (gt_area[None, :, None] + eps) / 2
    oks = (np.exp(-e) * vis[None]).sum(-1) / (vis.sum(-1)[None] + eps)
    return oks


class _TaskValidator:
    """Shared scaffolding: dataset/loader build + per-image unletterboxing."""

    task = "detect"

    def __init__(self, args: Optional[Dict] = None):
        self.args = get_cfg(overrides=args or {})
        if self.args.conf is None:
            self.args.conf = 0.001
        self.args.task = self.task

    def _setup(self, model):
        args = self.args
        args.imgsz = check_imgsz(int(args.imgsz), max(model.strides))
        data = check_det_dataset(args.data)
        split = data.get(args.split or "val") or data["val"]
        dataset = build_yolo_dataset(args, split, mode="val", data=data)
        loader = DataLoader(dataset, args.batch, shuffle=False, workers=args.workers, drop_last=False)
        return data, dataset, loader

    @staticmethod
    def _to_ori(xy_box: np.ndarray, gain, padw, padh, oh, ow, clip=True):
        b = xy_box.copy()
        b[:, [0, 2]] = (b[:, [0, 2]] - padw) / gain
        b[:, [1, 3]] = (b[:, [1, 3]] - padh) / gain
        if clip:
            b[:, [0, 2]] = b[:, [0, 2]].clip(0, ow)
            b[:, [1, 3]] = b[:, [1, 3]].clip(0, oh)
        return b

    @staticmethod
    def _gt_boxes(batch, i, imgs_shape):
        m = batch["mask"][i]
        gtn = batch["bboxes"][i][m]
        cls = batch["cls"][i][m].astype(np.float32)
        h, w = imgs_shape
        gx = gtn[:, :4] * np.asarray([w, h, w, h])
        gt = np.stack(
            [gx[:, 0] - gx[:, 2] / 2, gx[:, 1] - gx[:, 3] / 2,
             gx[:, 0] + gx[:, 2] / 2, gx[:, 1] + gx[:, 3] / 2], 1)
        return gt, cls, m

    def _log(self, name, seen, box_stats, task_stats, dt):
        if getattr(self.args, "verbose", True):
            LOGGER.info(
                f"val[{name}]: {seen} images  box mAP50 {box_stats['mAP50']:.3f} "
                f"mAP50-95 {box_stats['mAP50-95']:.3f} | {self.task} mAP50 "
                f"{task_stats['mAP50']:.3f} mAP50-95 {task_stats['mAP50-95']:.3f} "
                f"({seen / max(dt, 1e-9):.1f} img/s)"
            )


class SegmentationValidator(_TaskValidator):
    """Box + mask mAP (reference segment/val.py; mask IoU at proto res)."""

    task = "segment"

    def __call__(self, model, variables) -> Dict[str, float]:
        args = self.args
        data, dataset, loader = self._setup(model)
        box_m, mask_m = DetMetrics(data["names"]), DetMetrics(data["names"])

        @jax.jit
        def infer(variables, imgs):
            imgs = imgs.astype(jnp.float32) / 255.0
            boxes, scores, coeffs, protos = model.predict(variables, imgs)
            det, counts, idx = non_max_suppression(
                boxes, scores, conf_thres=float(args.conf), iou_thres=float(args.iou),
                max_det=int(args.max_det), multi_label=True, return_idx=True)
            sel = jnp.take_along_axis(coeffs, idx[..., None], axis=1)  # (B, max_det, nm)
            masks = jax.nn.sigmoid(jnp.einsum("bkn,bhwn->bkhw", sel, protos))
            return det, counts, masks

        seen, t0 = 0, time.time()
        n_images = len(dataset)
        for batch in loader:
            imgs = jnp.asarray(batch["img"])
            det, counts, pmasks = jax.device_get(infer(variables, imgs))
            hp, wp = pmasks.shape[-2:]
            ih, iw = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                if seen >= n_images:
                    break
                seen += 1
                n = int(counts[i])
                d = det[i, :n]
                gain, padw, padh = batch["ratio_pad"][i]
                oh, ow = batch["ori_shape"][i]
                pb = self._to_ori(d[:, :4], gain, padw, padh, oh, ow)
                gt, cls, valid_m = self._gt_boxes(batch, i, (ih, iw))
                gt_o = self._to_ori(gt, gain, padw, padh, oh, ow, clip=False)
                iou = box_iou_np(pb, gt_o) if n else np.zeros((0, len(gt_o)))
                tp_b = match_predictions(d[:, 5], cls, iou) if n else np.zeros((0, IOUV.size), bool)
                box_m.update(tp_b, d[:, 4], d[:, 5], cls)

                # mask branch at proto resolution: crop preds to boxes,
                # rebuild gt binaries from the overlap-index image
                pm = (pmasks[i, :n] > 0.5)
                if n:
                    sx, sy = wp / iw, hp / ih
                    for k in range(n):
                        x1, y1, x2, y2 = d[k, :4]
                        keep = np.zeros((hp, wp), bool)
                        xa, xb = int(max(x1 * sx, 0)), int(min(np.ceil(x2 * sx), wp))
                        ya, yb = int(max(y1 * sy, 0)), int(min(np.ceil(y2 * sy), hp))
                        keep[ya:yb, xa:xb] = True
                        pm[k] &= keep
                gidx = np.flatnonzero(valid_m)
                gmask_img = batch["masks"][i]
                if gmask_img.shape != (hp, wp):
                    import cv2

                    gmask_img = cv2.resize(gmask_img.astype(np.int32), (wp, hp), interpolation=cv2.INTER_NEAREST)
                gm = np.stack([(gmask_img == j + 1) for j in gidx]) if len(gidx) else np.zeros((0, hp, wp), bool)
                iou_m = mask_iou_np(pm.reshape(n, -1), gm.reshape(len(gm), -1)) if n and len(gm) else np.zeros((n, len(gm)))
                tp_m = match_predictions(d[:, 5], cls, iou_m) if n else np.zeros((0, IOUV.size), bool)
                mask_m.update(tp_m, d[:, 4], d[:, 5], cls)

        bs, ms = box_m.result(), mask_m.result()
        self._log("segment", seen, bs, ms, time.time() - t0)
        out = {f"box_{k}": v for k, v in bs.items() if isinstance(v, float)}
        out.update({f"mask_{k}": v for k, v in ms.items() if isinstance(v, float)})
        out["fitness"] = (bs["fitness"] + ms["fitness"]) / 2
        out.update({k: v for k, v in bs.items() if k in ("mAP50", "mAP50-95", "precision", "recall")})
        return out


class PoseValidator(_TaskValidator):
    """Box + OKS pose mAP (reference pose/val.py)."""

    task = "pose"

    def __call__(self, model, variables) -> Dict[str, float]:
        args = self.args
        data, dataset, loader = self._setup(model)
        nk, nd = model.kpt_shape
        sigmas = OKS_SIGMA if (nk, nd) == (17, 3) else np.ones(nk) / nk
        box_m, pose_m = DetMetrics(data["names"]), DetMetrics(data["names"])

        @jax.jit
        def infer(variables, imgs):
            imgs = imgs.astype(jnp.float32) / 255.0
            boxes, scores, kpts = model.predict(variables, imgs)
            det, counts, idx = non_max_suppression(
                boxes, scores, conf_thres=float(args.conf), iou_thres=float(args.iou),
                max_det=int(args.max_det), multi_label=True, return_idx=True)
            sel = jnp.take_along_axis(kpts, idx[..., None, None], axis=1)
            return det, counts, sel

        seen, t0 = 0, time.time()
        n_images = len(dataset)
        for batch in loader:
            imgs = jnp.asarray(batch["img"])
            det, counts, pkpts = jax.device_get(infer(variables, imgs))
            ih, iw = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                if seen >= n_images:
                    break
                seen += 1
                n = int(counts[i])
                d = det[i, :n]
                gain, padw, padh = batch["ratio_pad"][i]
                oh, ow = batch["ori_shape"][i]
                pb = self._to_ori(d[:, :4], gain, padw, padh, oh, ow)
                gt, cls, valid_m = self._gt_boxes(batch, i, (ih, iw))
                gt_o = self._to_ori(gt, gain, padw, padh, oh, ow, clip=False)
                iou = box_iou_np(pb, gt_o) if n else np.zeros((0, len(gt_o)))
                tp_b = match_predictions(d[:, 5], cls, iou) if n else np.zeros((0, IOUV.size), bool)
                box_m.update(tp_b, d[:, 4], d[:, 5], cls)

                pk = pkpts[i, :n].copy()  # (n, nk, nd) letterbox px
                pk[..., 0] = (pk[..., 0] - padw) / gain
                pk[..., 1] = (pk[..., 1] - padh) / gain
                gk = batch["keypoints"][i][valid_m].copy()  # normalized
                gk[..., 0] = (gk[..., 0] * iw - padw) / gain
                gk[..., 1] = (gk[..., 1] * ih - padh) / gain
                area = (gt_o[:, 2] - gt_o[:, 0]) * (gt_o[:, 3] - gt_o[:, 1]) * 0.53  # reference pose/val.py:Area*0.53
                oks = kpt_oks_np(pk, gk, area, sigmas) if n and len(gk) else np.zeros((n, len(gk)))
                tp_p = match_predictions(d[:, 5], cls, oks) if n else np.zeros((0, IOUV.size), bool)
                pose_m.update(tp_p, d[:, 4], d[:, 5], cls)

        bs, ps = box_m.result(), pose_m.result()
        self._log("pose", seen, bs, ps, time.time() - t0)
        out = {f"box_{k}": v for k, v in bs.items() if isinstance(v, float)}
        out.update({f"pose_{k}": v for k, v in ps.items() if isinstance(v, float)})
        out["fitness"] = (bs["fitness"] + ps["fitness"]) / 2
        out.update({k: v for k, v in bs.items() if k in ("mAP50", "mAP50-95", "precision", "recall")})
        return out


class OBBValidator(_TaskValidator):
    """Rotated-box mAP via probiou matching (reference obb/val.py)."""

    task = "obb"

    def __call__(self, model, variables) -> Dict[str, float]:
        args = self.args
        data, dataset, loader = self._setup(model)
        metrics = DetMetrics(data["names"])

        @jax.jit
        def infer(variables, imgs):
            imgs = imgs.astype(jnp.float32) / 255.0
            rboxes, scores = model.predict(variables, imgs)
            return nms_rotated(
                rboxes, scores, conf_thres=float(args.conf), iou_thres=float(args.iou),
                max_det=int(args.max_det))

        seen, t0 = 0, time.time()
        n_images = len(dataset)
        from experiment_yolo_tpu.ops.boxes import probiou

        for batch in loader:
            imgs = jnp.asarray(batch["img"])
            det, counts = jax.device_get(infer(variables, imgs))
            ih, iw = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                if seen >= n_images:
                    break
                seen += 1
                n = int(counts[i])
                d = det[i, :n]  # (n, 7) xywhr + conf + cls
                gain, padw, padh = batch["ratio_pad"][i]
                # pred rboxes -> original space (centers unpad, wh/gain)
                pr = d[:, :5].copy()
                pr[:, 0] = (pr[:, 0] - padw) / gain
                pr[:, 1] = (pr[:, 1] - padh) / gain
                pr[:, 2:4] /= gain
                m = batch["mask"][i]
                cls = batch["cls"][i][m].astype(np.float32)
                gr = batch["bboxes"][i][m].copy()  # (M, 5) normalized xywhr
                gr[:, 0] = (gr[:, 0] * iw - padw) / gain
                gr[:, 1] = (gr[:, 1] * ih - padh) / gain
                gr[:, 2] = gr[:, 2] * iw / gain
                gr[:, 3] = gr[:, 3] * ih / gain
                if n and len(gr):
                    iou = np.asarray(probiou(jnp.asarray(pr)[:, None], jnp.asarray(gr)[None]))
                else:
                    iou = np.zeros((n, len(gr)))
                tp = match_predictions(d[:, 6], cls, iou) if n else np.zeros((0, IOUV.size), bool)
                metrics.update(tp, d[:, 5], d[:, 6], cls)

        stats = metrics.result()
        dt = time.time() - t0
        if getattr(args, "verbose", True):
            LOGGER.info(
                f"val[obb]: {seen} images  P {stats['precision']:.3f} R {stats['recall']:.3f} "
                f"mAP50 {stats['mAP50']:.3f} mAP50-95 {stats['mAP50-95']:.3f} ({seen / max(dt, 1e-9):.1f} img/s)"
            )
        return stats


TASK_VALIDATORS = {
    "segment": SegmentationValidator,
    "pose": PoseValidator,
    "obb": OBBValidator,
}
