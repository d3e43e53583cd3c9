"""Data layer: YOLO-format datasets, augmentations, loaders, synthetic data."""

from experiment_yolo_tpu.data.build import DataLoader, build_dataloader, build_yolo_dataset
from experiment_yolo_tpu.data.dataset import YOLODataset, check_det_dataset
from experiment_yolo_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "DataLoader",
    "YOLODataset",
    "build_dataloader",
    "build_yolo_dataset",
    "check_det_dataset",
    "make_synthetic_dataset",
]
