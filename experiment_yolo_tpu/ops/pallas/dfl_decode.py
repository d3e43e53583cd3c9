"""Fused lane-packed DFL decode as a Pallas kernel with an analytic VJP.

Targets the measured ~26 ms decode slice of the DEAL train step
(docs/KERNELS.md "remaining loss cost"): the natural (..., 4, reg_max)
layout leaves VPU tiles 7/8 padding. This kernel packs 128//(4*reg_max)
anchors per 128-lane row (see ops/anchors.py:dfl_decode_packed for the
pure-XLA twin), computes exp once, reduces num+den in ONE
(TILE,128)@(128,2G) MXU matmul, and divides on the tiny (TILE,G) output —
a single HBM pass forward.

The backward pass is analytic (no saved softmax): with p = softmax(d) per
group and y = sum(p*bins), dL/dd = p * g * (bins - y). It recomputes
exp/den from the saved input in one pass and broadcasts den/y/g back to
lanes with (TILE,G)@(G,128) indicator matmuls — HBM traffic is read(x),
read(g), write(dx); autodiff of the jnp form instead saves and re-reads
the (.., reg_max) softmax residuals.

Reference semantics: nn/modules/block.py:DFL (softmax expectation over
reg_max bins). Correctness: tests/test_packed_decode.py (interpret mode on
CPU + gradient equality vs jax.grad of the jnp reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from experiment_yolo_tpu.ops.anchors import dfl_decode, packed_segment_matrices as _matrices


def _group_shift(x, groups: int):
    """Subtract each group's own max (NOT the row max: a cross-group logit
    spread > ~88 would underflow a whole group to den=0 -> NaN)."""
    t, lanes = x.shape
    reg_max = lanes // groups
    xg = x.reshape(t, groups, reg_max)
    mg = jnp.max(xg, axis=-1, keepdims=True)
    return (xg - mg).reshape(t, lanes)


def _fwd_kernel(x_ref, seg_ref, out_ref, *, groups: int):
    x = x_ref[:].astype(jnp.float32)
    e = jnp.exp(_group_shift(x, groups))
    nd = jnp.dot(e, seg_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = nd[:, groups:] / nd[:, :groups]


def _bwd_kernel(x_ref, y_ref, g_ref, seg_ref, ind_ref, bins_ref, dx_ref, *, groups: int):
    x = x_ref[:].astype(jnp.float32)
    e = jnp.exp(_group_shift(x, groups))
    den = jnp.dot(e, seg_ref[:, :groups], preferred_element_type=jnp.float32)
    inv_den_l = jnp.dot(1.0 / den, ind_ref[:], preferred_element_type=jnp.float32)
    y_l = jnp.dot(y_ref[:], ind_ref[:], preferred_element_type=jnp.float32)
    g_l = jnp.dot(g_ref[:], ind_ref[:], preferred_element_type=jnp.float32)
    p = e * inv_den_l
    dx_ref[:] = (p * g_l * (bins_ref[:] - y_l)).astype(dx_ref.dtype)


def _tile(rows: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if rows % t == 0:
            return t
    return 0


def _run_fwd(x2, reg_max: int, interpret: bool):
    rows = x2.shape[0]
    tile = _tile(rows)
    groups = 128 // reg_max
    seg, _, _ = _matrices(reg_max)
    return pl.pallas_call(
        partial(_fwd_kernel, groups=groups),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 2 * groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, groups), jnp.float32),
        interpret=interpret,
    )(x2, jnp.asarray(seg))


def _run_bwd(x2, y, g, reg_max: int, interpret: bool):
    rows = x2.shape[0]
    tile = _tile(rows)
    groups = 128 // reg_max
    seg, ind, bins = _matrices(reg_max)
    return pl.pallas_call(
        partial(_bwd_kernel, groups=groups),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, groups), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 2 * groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), x2.dtype),
        interpret=interpret,
    )(x2, y, g, jnp.asarray(seg), jnp.asarray(ind), jnp.asarray(bins))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _dfl_decode_pallas(pred_dist: jnp.ndarray, reg_max: int,
                       interpret: bool) -> jnp.ndarray:
    out, _ = _fwd_rule(pred_dist, reg_max, interpret)
    return out


def dfl_decode_pallas(pred_dist: jnp.ndarray, reg_max: int = 16,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in for :func:`experiment_yolo_tpu.ops.anchors.dfl_decode`.

    pred_dist (..., A, 4*reg_max) -> (..., A, 4) f32. Falls back to the jnp
    reference when the 128-lane packing doesn't divide the input.
    ``interpret`` defaults to True off-TPU (CPU tests) and False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dfl_decode_pallas(pred_dist, reg_max, bool(interpret))


def _supported(shape, reg_max: int) -> bool:
    side = 4 * reg_max
    total = 1
    for d in shape:
        total *= d
    if 128 % side != 0 or total % 128 != 0:
        return False
    return _tile(total // 128) > 0


def _fwd_rule(pred_dist, reg_max, interpret):
    shape = pred_dist.shape
    if not _supported(shape, reg_max):
        out = dfl_decode(pred_dist, reg_max)
        return out, (pred_dist, None)
    x2 = pred_dist.reshape(-1, 128)
    y = _run_fwd(x2, reg_max, interpret)
    return y.reshape(*shape[:-1], 4), (pred_dist, y)


def _bwd_rule(reg_max, interpret, res, g):
    pred_dist, y = res
    shape = pred_dist.shape
    if y is None:  # fallback path: differentiate the jnp reference
        _, vjp = jax.vjp(lambda d: dfl_decode(d, reg_max), pred_dist)
        return (vjp(g)[0],)
    groups = 128 // reg_max
    x2 = pred_dist.reshape(-1, 128)
    g2 = g.reshape(-1, groups).astype(jnp.float32)
    dx = _run_bwd(x2, y, g2, reg_max, interpret)
    return (dx.reshape(shape),)


_dfl_decode_pallas.defvjp(_fwd_rule, _bwd_rule)
