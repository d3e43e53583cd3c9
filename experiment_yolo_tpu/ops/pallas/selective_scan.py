"""Selective scan (Mamba SSM recurrence) — jnp reference + Pallas TPU kernel.

Counterpart of the reference's CUDA extension
(``nn/extra_modules/mamba/csrc/selective_scan/*``: fwd kernel 345 LoC +
dtype instantiations) used by its VSS/Mamba blocks. The recurrence

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t (+ D * x_t)

is evaluated two ways:

- ``selective_scan_reference``: `jax.lax.associative_scan` over the
  first-order recurrence (log-depth, XLA-fused) — the production path.
- ``selective_scan_pallas``: a sequential-chunk Pallas kernel that keeps
  the hidden state in VMEM and streams the sequence, the same schedule the
  CUDA kernel uses; equivalence-tested against the reference.

Shapes follow the Mamba convention: x (B, L, D), dt (B, L, D),
A (D, N), B/C (B, L, N), D (D,).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def selective_scan_reference(x, dt, a_mat, b_seq, c_seq, d_vec=None):
    """Associative-scan evaluation. Returns y (B, L, D)."""
    # decay (B, L, D, N) and input contribution
    da = jnp.exp(dt[..., None] * a_mat[None, None])  # (B, L, D, N)
    dbx = dt[..., None] * b_seq[:, :, None, :] * x[..., None]  # (B, L, D, N)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, h = jax.lax.associative_scan(combine, (da, dbx), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, c_seq)
    if d_vec is not None:
        y = y + x * d_vec[None, None]
    return y


def _scan_kernel(x_ref, dt_ref, a_ref, b_ref, c_ref, y_ref, h_scratch):
    """One batch program: sequential scan over L with h resident in VMEM.

    Block shapes: x/dt/y (1, L, D), a (D, N), b/c (1, L, N), h (D, N).
    """
    l = x_ref.shape[1]
    h_scratch[:] = jnp.zeros_like(h_scratch)

    def body(t, _):
        dt_t = dt_ref[0, t, :]  # (D,)
        x_t = x_ref[0, t, :]
        da = jnp.exp(dt_t[:, None] * a_ref[:])  # (D, N)
        dbx = (dt_t * x_t)[:, None] * b_ref[0, t, :][None, :]  # (D, N)
        h_scratch[:] = h_scratch[:] * da + dbx
        y_ref[0, t, :] = h_scratch[:] @ c_ref[0, t, :]  # (D,)
        return 0

    jax.lax.fori_loop(0, l, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def selective_scan_pallas(x, dt, a_mat, b_seq, c_seq, d_vec=None, interpret: bool = False):
    """Pallas evaluation; same contract as the reference function."""
    bsz, l, d = x.shape
    n = a_mat.shape[1]

    y = pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, l, d), jnp.float32),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((d, n), jnp.float32)],
        interpret=interpret,
    )(
        x.astype(jnp.float32),
        dt.astype(jnp.float32),
        a_mat.astype(jnp.float32),
        b_seq.astype(jnp.float32),
        c_seq.astype(jnp.float32),
    )
    if d_vec is not None:
        y = y + x * d_vec[None, None]
    return y
