"""Pallas TPU kernel: greedy NMS suppression.

The jnp NMS (ops/nms.py) materializes the (K, K) IoU matrix in HBM and
walks it with ``fori_loop``. This kernel keeps the candidate boxes resident
in VMEM and computes each row's IoU on the fly — O(K) VMEM state instead of
an O(K^2) HBM intermediate, one kernel launch per image.

Candidates must arrive score-sorted descending (as produced by the top-k
prefilter) with the class-offset trick already applied to the boxes.

Equivalence is tested against the pure-jnp reference in
tests/test_pallas_kernels.py (the reference repo's CUDA-vs-torch test
pattern, SURVEY.md §4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_suppress_kernel(boxes_ref, valid_ref, thr_ref, keep_ref):
    """boxes (K,4) f32, valid (K,1) i32, thr (1,1) f32 -> keep (K,1) i32."""
    k = boxes_ref.shape[0]
    thr = thr_ref[0, 0]
    keep_ref[:] = valid_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def body(i, _):
        bi_x1 = boxes_ref[i, 0]
        bi_y1 = boxes_ref[i, 1]
        bi_x2 = boxes_ref[i, 2]
        bi_y2 = boxes_ref[i, 3]
        area_i = jnp.maximum(bi_x2 - bi_x1, 0.0) * jnp.maximum(bi_y2 - bi_y1, 0.0)
        iw = jnp.maximum(jnp.minimum(x2, bi_x2) - jnp.maximum(x1, bi_x1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, bi_y2) - jnp.maximum(y1, bi_y1), 0.0)
        inter = iw * ih
        iou = inter / (area + area_i - inter + 1e-7)
        keep_i = keep_ref[i, 0]
        suppress = (iou > thr) & (row_ids > i) & (keep_i > 0)
        keep_ref[:] = jnp.where(suppress, 0, keep_ref[:])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def nms_suppress(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thres: float | jnp.ndarray, interpret: bool = False):
    """Greedy suppression mask for score-sorted candidates.

    Args:
        boxes: (K, 4) xyxy, score-sorted descending, class-offset applied.
        valid: (K,) bool — candidates above the confidence gate.
        iou_thres: scalar IoU threshold.

    Returns:
        keep: (K,) bool.
    """
    k = boxes.shape[0]
    keep = pl.pallas_call(
        _nms_suppress_kernel,
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        boxes.astype(jnp.float32),
        valid.astype(jnp.int32)[:, None],
        jnp.asarray(iou_thres, jnp.float32).reshape(1, 1),
    )
    return keep[:, 0] > 0


def nms_suppress_reference(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thres) -> jnp.ndarray:
    """Pure-jnp reference (the ops/nms.py inner loop, factored out)."""
    from experiment_yolo_tpu.ops.boxes import box_iou

    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, keep):
        suppress = (iou[i] > iou_thres) & keep[i] & valid[i]
        suppress = suppress.at[i].set(False)
        later = jnp.arange(k) > i
        return keep & ~(suppress & later)

    return jax.lax.fori_loop(0, k, body, valid)
