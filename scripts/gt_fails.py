"""Per-image false-positive counter — counterpart of the reference's
top-level ``gt_fails.py`` (94 LoC): greedy IoU>=0.5 class-matched matching
of predictions against ground truth, reporting FPs per image.

Usage:
    python scripts/gt_fails.py model=<ckpt-or-yaml> data=<data.yaml> [split=val conf=0.25]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from experiment_yolo_tpu import YOLO
from experiment_yolo_tpu.cfg.cli import parse_key_value
from experiment_yolo_tpu.data import check_det_dataset
from experiment_yolo_tpu.data.dataset import YOLODataset
from experiment_yolo_tpu.utils import LOGGER
from experiment_yolo_tpu.utils.metrics import box_iou_np


def count_fps(preds, gts, iou_thr: float = 0.5) -> tuple:
    """Greedy IoU matching; returns (tp, fp, fn) for one image."""
    if len(preds) == 0:
        return 0, 0, len(gts)
    if len(gts) == 0:
        return 0, len(preds), 0
    iou = box_iou_np(preds[:, :4], gts[:, :4])
    cls_ok = preds[:, 5][:, None] == gts[:, 4][None]
    iou = np.where(cls_ok, iou, 0.0)
    matched_gt = set()
    tp = 0
    for i in np.argsort(-preds[:, 4]):  # confidence order
        j = int(iou[i].argmax())
        if iou[i, j] >= iou_thr and j not in matched_gt:
            matched_gt.add(j)
            tp += 1
    return tp, len(preds) - tp, len(gts) - tp


def main(argv):
    kv = parse_key_value(argv)
    model = YOLO(kv.pop("model"))
    data = check_det_dataset(kv.pop("data"))
    split = kv.pop("split", "val")
    conf = float(kv.pop("conf", 0.25))
    ds = YOLODataset(data[split], imgsz=int(kv.get("imgsz", 640)), augment=False)
    total_tp = total_fp = total_fn = 0
    worst = []
    for i in range(len(ds)):
        item = ds._load_item(i)
        r = model.predict(item["img"], conf=conf, imgsz=int(kv.get("imgsz", 640)))[0]
        preds = r.boxes.data
        gts = np.concatenate([item["bboxes"], item["cls"][:, None]], 1) if len(item["cls"]) else np.zeros((0, 5))
        tp, fp, fn = count_fps(preds, gts)
        total_tp += tp
        total_fp += fp
        total_fn += fn
        if fp:
            worst.append((fp, item["im_file"]))
    LOGGER.info(f"TP {total_tp}  FP {total_fp}  FN {total_fn}")
    for fp, f in sorted(worst, reverse=True)[:20]:
        LOGGER.info(f"  {fp:3d} FP  {f}")


if __name__ == "__main__":
    main(sys.argv[1:])
