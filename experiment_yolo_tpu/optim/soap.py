"""SOAP optimizer (Shampoo-with-Adam-in-eigenbasis, arXiv:2409.11321) in optax.

Functional rebuild of the reference's embedded ``SOAP(optim.Optimizer)``
(engine/trainer.py:54-474). Per parameter tensor:

- one Kronecker-factor preconditioner ``GG_i`` per tensor axis (axes larger
  than ``max_precond_dim`` are left unpreconditioned; 1-D params run plain
  Adam, matching ``precondition_1d=False``);
- eigenbasis ``Q_i`` initialized by ``eigh`` on the first step and refreshed
  every ``precondition_frequency`` steps by one power-iteration + QR round
  (with the estimated-eigenvalue sort and matching ``exp_avg_sq``
  permutation of the reference's ``get_orthogonal_matrix_QR``);
- Adam runs in the rotated space; ``exp_avg`` is re-projected across basis
  refreshes exactly as the reference does (project-back -> refresh ->
  re-project);
- the first step only accumulates statistics and applies no update
  (reference's ``continue`` after init).

Everything is static-shape and jittable: refreshes happen under
``lax.cond``; ``eigh``/``qr`` run on-device (MXU-heavy, amortized over
``precondition_frequency`` steps).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class SoapLeafState(NamedTuple):
    exp_avg: jnp.ndarray  # first moment, stored in current eigenbasis
    exp_avg_sq: jnp.ndarray  # second moment, rotated space
    gg: Tuple[Any, ...]  # per-axis preconditioners ((d,d) array or None)
    q: Tuple[Any, ...]  # per-axis eigenbases ((d,d) array or None)


class SoapState(NamedTuple):
    count: jnp.ndarray
    leaves: Any  # pytree of SoapLeafState


def _project(g, qs, transpose: bool):
    """Rotate tensor into (transpose=False) / out of (True) the eigenbasis.

    Mirrors the reference's axis-cycling tensordot: each step consumes the
    leading axis and appends the result axis at the end, so after all axes
    the original order is restored.
    """
    for q in qs:
        if q is None:
            g = jnp.moveaxis(g, 0, -1)
        else:
            g = jnp.tensordot(g, q, axes=(0, 1 if transpose else 0))
    return g


def _update_gg(gg, g, beta):
    """EMA of per-axis outer products: GG_i <- beta*GG_i + (1-beta)*sum_other g g^T."""
    out = []
    for i, m in enumerate(gg):
        if m is None:
            out.append(None)
        else:
            axes = tuple(j for j in range(g.ndim) if j != i)
            outer = jnp.tensordot(g, g, axes=(axes, axes))
            out.append(m * beta + outer * (1 - beta))
    return out


def _eigh_q(gg):
    qs = []
    for m in gg:
        if m is None:
            qs.append(None)
        else:
            _, q = jnp.linalg.eigh(m + 1e-30 * jnp.eye(m.shape[0], dtype=m.dtype))
            qs.append(jnp.flip(q, axis=1))  # descending eigenvalues
    return qs


def _qr_refresh(gg, qs, exp_avg_sq):
    """One power-iteration + QR round per axis, sorting by estimated
    eigenvalues and permuting exp_avg_sq along that axis to match."""
    new_qs = []
    for i, (m, o) in enumerate(zip(gg, qs)):
        if m is None:
            new_qs.append(None)
            continue
        est_eig = jnp.einsum("ij,jk,ki->i", o.T, m, o)
        sort_idx = jnp.argsort(-est_eig)
        exp_avg_sq = jnp.take(exp_avg_sq, sort_idx, axis=i)
        o = o[:, sort_idx]
        q, _ = jnp.linalg.qr(m @ o)
        new_qs.append(q)
    return new_qs, exp_avg_sq


def soap(
    learning_rate,
    b1: float = 0.95,
    b2: float = 0.95,
    shampoo_beta: float = -1.0,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decay_mask=None,
    precondition_frequency: int = 10,
    max_precond_dim: int = 10000,
    correct_bias: bool = True,
) -> optax.GradientTransformation:
    """Build the SOAP gradient transformation.

    learning_rate: float or callable(step) -> lr.
    decay_mask: pytree of bools selecting params that receive (decoupled)
    weight decay.
    """
    sh_beta = shampoo_beta if shampoo_beta >= 0 else b2
    lr_fn = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def leaf_precond_axes(p):
        if p.ndim <= 1:
            return tuple([None] * p.ndim)  # 1-D: plain Adam
        return tuple(d if d <= max_precond_dim else None for d in p.shape)

    def init(params):
        def mk(p):
            axes = leaf_precond_axes(p)
            gg = tuple(None if a is None else jnp.zeros((a, a), p.dtype) for a in axes)
            q = tuple(None if a is None else jnp.eye(a, dtype=p.dtype) for a in axes)
            return SoapLeafState(jnp.zeros_like(p), jnp.zeros_like(p), gg, q)

        return SoapState(jnp.zeros([], jnp.int32), jax.tree.map(mk, params))

    def update(grads, state, params):
        step = state.count  # 0 on first call
        lr = lr_fn(step)
        adam_step = step.astype(jnp.float32)  # bias-correction counter (first real update = 1)

        def upd_leaf(g, p, leaf):
            preconditioned = any(q is not None for q in leaf.q)

            def first_step():
                gg1 = _update_gg(leaf.gg, g, sh_beta)
                q1 = _eigh_q(gg1) if preconditioned else list(leaf.q)
                return jnp.zeros_like(g), SoapLeafState(leaf.exp_avg, leaf.exp_avg_sq, tuple(gg1), tuple(q1))

            def later_step():
                g_proj = _project(g, leaf.q, transpose=False)
                exp_avg = leaf.exp_avg * b1 + g_proj * (1 - b1)
                exp_avg_sq = leaf.exp_avg_sq * b2 + g_proj**2 * (1 - b2)
                denom = jnp.sqrt(exp_avg_sq) + eps
                if correct_bias:
                    bc1 = 1.0 - b1**adam_step
                    bc2 = 1.0 - b2**adam_step
                    step_size = lr * jnp.sqrt(bc2) / bc1
                else:
                    step_size = lr
                norm_grad = _project(exp_avg / denom, leaf.q, transpose=True)
                delta = -step_size * norm_grad
                # post-step preconditioner update (reference: update after step)
                exp_avg_orig = _project(exp_avg, leaf.q, transpose=True)
                gg1 = tuple(_update_gg(leaf.gg, g, sh_beta))

                if preconditioned:
                    def refresh(args):
                        qs, eas = args
                        nq, ne = _qr_refresh(gg1, qs, eas)
                        return tuple(nq), ne

                    def keep(args):
                        return args

                    q1, exp_avg_sq = jax.lax.cond(
                        step % precondition_frequency == 0, refresh, keep, (leaf.q, exp_avg_sq)
                    )
                else:
                    q1 = leaf.q
                exp_avg = _project(exp_avg_orig, q1, transpose=False)
                return delta, SoapLeafState(exp_avg, exp_avg_sq, gg1, q1)

            if not preconditioned and g.ndim <= 1:
                # 1-D plain-Adam path has no basis bookkeeping; still skip step 0
                def first1():
                    return jnp.zeros_like(g), leaf

                def later1():
                    exp_avg = leaf.exp_avg * b1 + g * (1 - b1)
                    exp_avg_sq = leaf.exp_avg_sq * b2 + g**2 * (1 - b2)
                    denom = jnp.sqrt(exp_avg_sq) + eps
                    if correct_bias:
                        bc1 = 1.0 - b1**adam_step
                        bc2 = 1.0 - b2**adam_step
                        step_size = lr * jnp.sqrt(bc2) / bc1
                    else:
                        step_size = lr
                    return -step_size * exp_avg / denom, SoapLeafState(exp_avg, exp_avg_sq, leaf.gg, leaf.q)

                return jax.lax.cond(step == 0, first1, later1)
            return jax.lax.cond(step == 0, first_step, later_step)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = jax.tree.leaves(params)
        flat_s = treedef.flatten_up_to(state.leaves)
        flat_mask = (
            jax.tree.leaves(decay_mask) if decay_mask is not None else [True] * len(flat_g)
        )
        deltas, new_leaves = [], []
        for g, p, s, dm in zip(flat_g, flat_p, flat_s, flat_mask):
            d, ns = upd_leaf(g, p, s)
            if weight_decay > 0 and dm:
                d = d - lr * weight_decay * p
            deltas.append(d)
            new_leaves.append(ns)
        updates = jax.tree.unflatten(treedef, deltas)
        leaves = jax.tree.unflatten(treedef, new_leaves)
        return updates, SoapState(step + 1, leaves)

    return optax.GradientTransformation(init, update)
