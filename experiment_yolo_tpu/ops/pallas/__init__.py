"""Pallas TPU kernels with pure-jnp references (SURVEY.md §2.4 native ops)."""

from experiment_yolo_tpu.ops.pallas.ldconv_kernel import bilinear_gather_reference, bilinear_gather_single
from experiment_yolo_tpu.ops.pallas.nms_kernel import nms_suppress, nms_suppress_reference

__all__ = [
    "bilinear_gather_reference",
    "bilinear_gather_single",
    "nms_suppress",
    "nms_suppress_reference",
]
