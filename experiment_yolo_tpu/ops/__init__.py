"""Pure-jnp ops: box math, anchors/decoding, static-shape NMS, Pallas kernels."""

from experiment_yolo_tpu.ops.anchors import bbox2dist, decode_detections, dfl_decode, dist2bbox, make_anchors
from experiment_yolo_tpu.ops.boxes import (
    bbox_iou,
    box_iou,
    clip_boxes,
    scale_boxes,
    wasserstein_similarity,
    wise_iou_loss,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from experiment_yolo_tpu.ops.nms import non_max_suppression

__all__ = [
    "bbox2dist",
    "bbox_iou",
    "box_iou",
    "clip_boxes",
    "decode_detections",
    "dfl_decode",
    "dist2bbox",
    "make_anchors",
    "non_max_suppression",
    "scale_boxes",
    "wasserstein_similarity",
    "wise_iou_loss",
    "xywh2xyxy",
    "xywhn2xyxy",
    "xyxy2xywh",
    "xyxy2xywhn",
]
