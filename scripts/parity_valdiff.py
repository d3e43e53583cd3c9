"""Attribute the residual val-protocol dmAP50 to its stage (VERDICT r5 #3).

Forward parity is proven (layer-0..22 match to ~3e-6 in f32); the val
residual must come from (a) the detection stage (NMS protocol under val
settings) or (b) the metric stage (matching + AP). This script runs both
frameworks' val pipelines on the shared synthetic val split with the SAME
trained weights and separates the two:

  A. per-image detections, ours vs theirs (counts + matched box/conf diffs)
  B. cross-metric: THEIR detections pushed through BOTH metric stacks, and
     OUR detections pushed through BOTH metric stacks — the mAP50 spread on
     identical detections isolates the metric-stage residual.

Usage: python scripts/parity_valdiff.py [ckpt=...] [data=...] [imgsz=320]
       [n=512] (CPU-forced, f32-highest)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools" / "refstub"))
sys.path.insert(0, str(REF))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402


def main(argv):
    kv = dict(a.partition("=")[::2] for a in argv)
    ckpt = Path(kv.get("ckpt", REPO / "runs/parity_r5/train/yolov8n_synth/weights/best"))
    data_root = Path(kv.get("data", REPO / "runs/parity_r5/dataset"))
    imgsz = int(kv.get("imgsz", 320))
    n_max = int(kv.get("n", 512))
    conf_t, iou_t = 0.001, 0.7

    from ultralytics.nn.tasks import DetectionModel as TDM
    from ultralytics.utils import ops as tops

    from experiment_yolo_tpu.engine.checkpoint import load_checkpoint
    from experiment_yolo_tpu.ops import nms as our_nms
    from experiment_yolo_tpu.utils.torch_convert import invert_to_torch_state

    model, variables = load_checkpoint(ckpt)
    tmodel = TDM(str(REPO / "experiment_yolo_tpu/cfg/models/yolov8n.yaml"),
                 nc=model.nc, verbose=False)
    shapes = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    back = invert_to_torch_state(variables, shapes, model)
    tmodel.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in back.items()},
                           strict=False)
    tmodel = tmodel.float().eval()

    predict = jax.jit(model.predict)

    img_dir = data_root / "images" / "val"
    lab_dir = data_root / "labels" / "val"
    paths = sorted(img_dir.glob("*.jpg"))[:n_max]

    ours_dets, ref_dets, labels = [], [], []
    n_count_diff, worst_box, worst_conf = 0, 0.0, 0.0
    for k, p in enumerate(paths):
        img = cv2.imread(str(p))[..., ::-1]
        x = img[None].astype(np.float32) / 255.0
        t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            raw_t = tmodel(t)[0]
        det_t = tops.non_max_suppression(raw_t, conf_t, iou_t, multi_label=True,
                                         max_det=300)[0].numpy()
        boxes_o, scores_o = predict(variables, jnp.asarray(x))
        det_o, cnt = our_nms.non_max_suppression(
            boxes_o, scores_o, conf_thres=conf_t, iou_thres=iou_t, max_det=300,
            multi_label=True, pre_nms_topk=4096, nms_type="soft",
            soft_first_quirk=True)
        det_o = np.asarray(det_o[0])[: int(cnt[0])]

        if len(det_t) != len(det_o):
            n_count_diff += 1
            if n_count_diff <= 5:
                print(f"[{p.name}] count ref={len(det_t)} ours={len(det_o)}")
        m = min(len(det_t), len(det_o))
        if m:
            a = det_t[np.lexsort((det_t[:m, 5], -det_t[:m, 4]))][:m]
            b = det_o[np.lexsort((det_o[:m, 5], -det_o[:m, 4]))][:m]
            worst_box = max(worst_box, float(np.abs(a[:, :4] - b[:, :4]).max()))
            worst_conf = max(worst_conf, float(np.abs(a[:, 4] - b[:, 4]).max()))

        ours_dets.append(det_o)
        ref_dets.append(det_t)
        lab = np.loadtxt(lab_dir / (p.stem + ".txt"), ndmin=2)
        cls = lab[:, 0]
        xywh = lab[:, 1:5] * imgsz
        xyxy = np.stack([xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
                         xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2], 1)
        labels.append((cls, xyxy))
        if (k + 1) % 128 == 0:
            print(f"  .. {k + 1}/{len(paths)} images")

    print(f"\n[A detections] images with count mismatch: {n_count_diff}/{len(paths)}; "
          f"worst matched box diff {worst_box:.4f}px, conf diff {worst_conf:.6f}")

    # ---- stage B: same detections through both metric stacks ----
    from ultralytics.utils.metrics import ap_per_class as t_ap_per_class
    from ultralytics.utils.metrics import box_iou as t_box_iou

    from experiment_yolo_tpu.utils.metrics import ap_per_class as o_ap_per_class
    from experiment_yolo_tpu.utils.metrics import box_iou_np as o_box_iou_np
    from experiment_yolo_tpu.utils.metrics import match_predictions as o_match

    iouv = np.linspace(0.5, 0.95, 10)

    from ultralytics.engine.validator import BaseValidator

    class _V:  # minimal host for the reference's match_predictions
        match_predictions = BaseValidator.match_predictions

    tv = _V()
    tv.iouv = torch.from_numpy(iouv)

    def their_metric(dets):
        tp, confs, pred_cls, target_cls = [], [], [], []
        for det, (cls, xyxy) in zip(dets, labels):
            det_t = torch.from_numpy(np.asarray(det, np.float32))
            gt_c = torch.from_numpy(cls.astype(np.float32))
            gt_b = torch.from_numpy(xyxy.astype(np.float32))
            if len(det) == 0:
                tp.append(torch.zeros(0, 10, dtype=torch.bool))
            else:
                iou = t_box_iou(gt_b, det_t[:, :4])
                tp.append(tv.match_predictions(det_t[:, 5], gt_c, iou))
            confs.append(det_t[:, 4]); pred_cls.append(det_t[:, 5])
            target_cls.append(gt_c)
        out = t_ap_per_class(torch.cat(tp).numpy(), torch.cat(confs).numpy(),
                             torch.cat(pred_cls).numpy(), torch.cat(target_cls).numpy(),
                             names={0: "c0", 1: "c1", 2: "c2"})
        ap = out[5] if isinstance(out, tuple) else out["ap"]
        return float(ap[:, 0].mean()), float(ap.mean())

    def our_metric(dets):
        tp, confs, pred_cls, target_cls = [], [], [], []
        for det, (cls, xyxy) in zip(dets, labels):
            det = np.asarray(det, np.float32)
            if len(det) == 0:
                tp.append(np.zeros((0, 10), bool))
            else:
                iou = o_box_iou_np(det[:, :4], xyxy.astype(np.float32))  # (N pred, M gt)
                tp.append(np.asarray(o_match(det[:, 5], cls, iou)))
            confs.append(det[:, 4]); pred_cls.append(det[:, 5])
            target_cls.append(cls)
        r = o_ap_per_class(np.concatenate(tp), np.concatenate(confs),
                           np.concatenate(pred_cls), np.concatenate(target_cls))
        ap = r["ap"] if isinstance(r, dict) else r[5]
        ap = np.asarray(ap)
        return float(ap[:, 0].mean()), float(ap.mean())

    for name, dets in (("REF dets", ref_dets), ("OUR dets", ours_dets)):
        tm50, tm = their_metric(dets)
        om50, om = our_metric(dets)
        print(f"[B metrics/{name}] their stack mAP50={tm50:.4f} mAP={tm:.4f} | "
              f"our stack mAP50={om50:.4f} mAP={om:.4f} | d50={abs(tm50 - om50):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
