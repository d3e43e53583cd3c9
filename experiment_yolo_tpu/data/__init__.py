"""Data layer: YOLO-format datasets, augmentations, loaders, synthetic data."""

from experiment_yolo_tpu.data.build import DataLoader, build_dataloader, build_yolo_dataset
from experiment_yolo_tpu.data.converter import (
    coco80_to_coco91_class,
    coco91_to_coco80_class,
    convert_coco,
    convert_dota_to_yolo_obb,
    yolo_bbox2segment,
)
from experiment_yolo_tpu.data.dataset import YOLODataset, check_cls_dataset, check_det_dataset
from experiment_yolo_tpu.data.split_dota import split_test, split_trainval
from experiment_yolo_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "DataLoader",
    "YOLODataset",
    "build_dataloader",
    "build_yolo_dataset",
    "check_cls_dataset",
    "check_det_dataset",
    "coco80_to_coco91_class",
    "coco91_to_coco80_class",
    "convert_coco",
    "convert_dota_to_yolo_obb",
    "make_synthetic_dataset",
    "split_test",
    "split_trainval",
    "yolo_bbox2segment",
]
