"""HBM-aware automatic batch-size selection.

TPU-native rebuild of the reference's ``ultralytics/utils/autobatch.py:13``
(CUDA autobatch: run profile batches, polyfit memory vs batch, solve for a
fraction of free VRAM). On TPU nothing needs to RUN: XLA's ahead-of-time
compile reports the program's exact peak memory, so we AOT-compile the real
train step at two batch sizes, fit the (perfectly linear) peak-vs-batch
line, and solve for the target HBM fraction — no OOM risk, no warmup steps.

Triggered like the reference via ``batch: -1`` in the train args.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.utils import LOGGER


def _hbm_limit_bytes() -> int | None:
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def _step_peak_bytes(model, loss_cfg, batch: int, imgsz: int, max_labels: int, dtype) -> int:
    """AOT-compile forward+loss+grad at this batch and return XLA's peak."""
    from experiment_yolo_tpu.utils.loss import detection_loss

    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0)))

    def loss_fn(params, batch_stats, imgs, bboxes, cls, mask):
        feats, _ = model.module.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs.astype(dtype) / 255.0, True, mutable=["batch_stats"],
        )
        total, _, _ = detection_loss(
            [f.astype(jnp.float32) for f in feats],
            {"bboxes": bboxes, "cls": cls, "mask": mask},
            model.strides, loss_cfg,
        )
        return total

    grad_fn = jax.jit(jax.grad(loss_fn))
    args = (
        variables["params"],
        variables["batch_stats"],
        jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch, max_labels, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch, max_labels), jnp.int32),
        jax.ShapeDtypeStruct((batch, max_labels), jnp.bool_),
    )
    compiled = grad_fn.lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("backend reports no memory analysis")
    return int(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes)


def autobatch(model, imgsz: int = 640, fraction: float = 0.60, default_batch: int = 16,
              max_labels: int = 128, loss_cfg=None, dtype=jnp.bfloat16, max_batch: int = 1024) -> int:
    """Estimate the largest train batch using ``fraction`` of device HBM.

    Falls back to ``default_batch`` when the backend exposes no memory
    limit (CPU) or compilation fails — the reference's CPU fallback
    (autobatch.py:48)."""
    from experiment_yolo_tpu.utils.loss import LossConfig

    limit = _hbm_limit_bytes()
    if not limit:
        LOGGER.info(f"AutoBatch: no device memory limit reported, using default batch {default_batch}")
        return default_batch
    loss_cfg = loss_cfg or LossConfig(nc=model.nc)
    try:
        b_lo, b_hi = 4, 8
        p_lo = _step_peak_bytes(model, loss_cfg, b_lo, imgsz, max_labels, dtype)
        p_hi = _step_peak_bytes(model, loss_cfg, b_hi, imgsz, max_labels, dtype)
    except Exception as e:  # unsupported backend / compile failure
        LOGGER.warning(f"AutoBatch: compile probe failed ({type(e).__name__}: {e}); default batch {default_batch}")
        return default_batch
    slope = max((p_hi - p_lo) / (b_hi - b_lo), 1.0)
    fixed = p_lo - slope * b_lo
    budget = limit * fraction
    b = int((budget - fixed) / slope)
    b = int(np.clip((b // 8) * 8 if b >= 8 else b, 1, max_batch))
    LOGGER.info(
        f"AutoBatch: HBM {limit / 1e9:.1f}GB, {slope / 1e6:.0f}MB/img @ {imgsz}px "
        f"+ {fixed / 1e6:.0f}MB fixed -> batch {b} for {fraction:.0%} budget"
    )
    return b
