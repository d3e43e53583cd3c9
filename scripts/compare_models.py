"""Bootstrap statistical comparison of two models — counterpart of the
reference's ``testandcox.py`` (307 LoC): resampled mAP50 with paired
t-test / Wilcoxon / Cohen's d / confidence intervals.

Usage:
    python scripts/compare_models.py model_a=<ckpt> model_b=<ckpt> data=<yaml> \
        [split=val n_bootstrap=30 fraction=0.5 imgsz=640]
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
from experiment_yolo_tpu.utils.metrics import DetMetrics, IOUV, box_iou_np, match_predictions
from experiment_yolo_tpu.utils.stats import bootstrap_indices, compare_scores


def per_image_stats(model: YOLO, ds: YOLODataset, imgsz: int, conf: float = 0.001):
    """Precompute per-image (tp, conf, pred_cls, target_cls) once; bootstrap
    subsamples then reuse them (the reference re-runs val per subsample —
    precomputation gives identical statistics at a fraction of the cost)."""
    stats = []
    for i in range(len(ds)):
        item = ds._load_item(i)
        r = model.predict(item["img"], conf=conf, imgsz=imgsz)[0]
        d = r.boxes.data
        gt_cls = item["cls"]
        if len(d) == 0:
            tp = np.zeros((0, IOUV.size), bool)
        else:
            iou = box_iou_np(d[:, :4], item["bboxes"]) if len(gt_cls) else np.zeros((len(d), 0))
            tp = match_predictions(d[:, 5], gt_cls, iou)
        stats.append((tp, d[:, 4], d[:, 5], gt_cls))
    return stats


def map50_of_subset(stats, idx):
    m = DetMetrics()
    for i in idx:
        m.update(*stats[i])
    return m.result()["mAP50"]


def main(argv):
    kv = parse_key_value(argv)
    imgsz = int(kv.get("imgsz", 640))
    data = check_det_dataset(kv["data"])
    ds = YOLODataset(data[kv.get("split", "val")], imgsz=imgsz, augment=False)
    model_a, model_b = YOLO(kv["model_a"]), YOLO(kv["model_b"])
    LOGGER.info("precomputing per-image stats (model A)...")
    stats_a = per_image_stats(model_a, ds, imgsz)
    LOGGER.info("precomputing per-image stats (model B)...")
    stats_b = per_image_stats(model_b, ds, imgsz)
    idxs = bootstrap_indices(len(ds), int(kv.get("n_bootstrap", 30)), float(kv.get("fraction", 0.5)))
    a = np.asarray([map50_of_subset(stats_a, i) for i in idxs])
    b = np.asarray([map50_of_subset(stats_b, i) for i in idxs])
    r = compare_scores(a, b)
    LOGGER.info(f"model A mAP50: {a.mean():.4f} +/- {a.std():.4f}")
    LOGGER.info(f"model B mAP50: {b.mean():.4f} +/- {b.std():.4f}")
    LOGGER.info(r.summary())


if __name__ == "__main__":
    main(sys.argv[1:])
