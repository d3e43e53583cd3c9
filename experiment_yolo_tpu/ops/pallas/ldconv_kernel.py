"""Pallas TPU kernel: LDConv bilinear gather.

The LDConv inner loop (nn/modules.py:ldconv_bilinear_gather) samples N
deformed points per output pixel with bilinear interpolation — the
reference implements it as four big gathers (conv.py:389-470, pure torch;
BASELINE names it a Pallas target).

This kernel keeps the (H*W, C) feature plane resident in VMEM and walks
query blocks, fetching the four corner rows per query with scalar dynamic
indexing and accumulating the weighted sum in registers. HBM traffic is
O(H*W*C + Q*C) — the four XLA gathers re-read the plane per corner.

The production forward currently uses the XLA gather (faster for the small
C of the DEAL stems, where gather is bandwidth-trivial); this kernel is the
building block for a future fully-fused LDConv (offsets -> gather ->
projection) and is equivalence-tested against the jnp reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, w_ref, x_ref, out_ref):
    """idx (Q, 4) i32 in SMEM; w (Q, 4) f32; x (HW, C); out (Q, C)."""
    q = out_ref.shape[0]

    def body(i, _):
        i0 = idx_ref[i, 0]
        i1 = idx_ref[i, 1]
        i2 = idx_ref[i, 2]
        i3 = idx_ref[i, 3]
        acc = (
            w_ref[i, 0] * x_ref[i0, :]
            + w_ref[i, 1] * x_ref[i1, :]
            + w_ref[i, 2] * x_ref[i2, :]
            + w_ref[i, 3] * x_ref[i3, :]
        )
        out_ref[i, :] = acc
        return 0

    jax.lax.fori_loop(0, q, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def bilinear_gather_single(x: jnp.ndarray, p: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Bilinear sample one image: x (H, W, C), p (Q, 2) (row, col) floats.

    Returns (Q, C). Positions are clamped at borders like the reference.
    """
    h, w, c = x.shape
    pr = jnp.clip(p[:, 0], 0.0, h - 1)
    pc = jnp.clip(p[:, 1], 0.0, w - 1)
    r0 = jnp.clip(jnp.floor(pr), 0, h - 1)
    c0 = jnp.clip(jnp.floor(pc), 0, w - 1)
    r1 = jnp.clip(r0 + 1, 0, h - 1)
    c1 = jnp.clip(c0 + 1, 0, w - 1)
    wr1 = pr - r0
    wc1 = pc - c0
    wr0 = 1.0 - wr1
    wc0 = 1.0 - wc1
    idx = jnp.stack(
        [r0 * w + c0, r1 * w + c1, r1 * w + c0, r0 * w + c1], axis=1
    ).astype(jnp.int32)
    wgt = jnp.stack([wr0 * wc0, wr1 * wc1, wr1 * wc0, wr0 * wc1], axis=1).astype(jnp.float32)

    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((p.shape[0], c), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx, wgt, x.reshape(h * w, c).astype(jnp.float32))


def bilinear_gather_reference(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp reference: same math via ldconv_bilinear_gather."""
    from experiment_yolo_tpu.nn.modules import ldconv_bilinear_gather

    out = ldconv_bilinear_gather(x[None], p[None, None, None])  # (1,1,1,Q,C)
    return out[0, 0, 0]
