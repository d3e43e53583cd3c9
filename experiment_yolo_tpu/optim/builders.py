"""Optimizer construction with Ultralytics-compatible semantics.

Rebuild of the reference's ``BaseTrainer.build_optimizer``
(engine/trainer.py:1115): three parameter groups — g0 conv/dense weights
(weight decay), g1 norm scales (no decay), g2 biases (no decay, higher
warmup LR) — per-step LR warmup interpolation and momentum warmup, then a
linear or cosine epoch schedule. All of it expressed as pure optax
transforms driven by step-index schedules so the whole update is jittable.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _torch_step_plan(nb: int, epochs: int, warmup_epochs: float, k_full: int):
    """Simulate the reference's optimizer firing plan (trainer.py:783-815).

    During warmup (nw = max(round(warmup_epochs*nb), 100) batches) accumulate
    ramps 1 -> k_full; the optimizer fires at batch ni whenever
    ni - last_opt_step >= accumulate. Returns (k_table, ni_table): for
    update u, k_table[u] batches were accumulated and ni_table[u] is the
    batch index whose interpolated warmup LR/momentum the update sees.
    """
    nw = max(round(warmup_epochs * nb), 100) if warmup_epochs > 0 else -1
    total = max(nb * epochs, 1)
    ks, nis, last, acc = [], [], -1, k_full
    for ni in range(total):
        if ni <= nw:
            acc = max(1, int(round(np.interp(ni, [0, nw], [1, k_full]))))
        if ni - last >= acc:
            ks.append(ni - last)
            nis.append(ni)
            last = ni
    if not ks:  # degenerate tiny runs: one update of everything
        ks, nis = [total], [total - 1]
    return np.asarray(ks, np.int32), np.asarray(nis, np.int32)


def param_group_label(path: tuple, leaf) -> str:
    """'bias' | 'norm' | 'weight' from a flax param path.

    BN scales/biases live under modules named 'bn' with leaves
    'scale'/'bias'/'mean'/'var'; plain biases are leaves named 'bias'.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    leaf_name = names[-1] if names else ""
    # Reference build_optimizer (trainer.py:1144-1152) checks 'bias' in the
    # fullname FIRST, so BN biases land in g2 (bias, warmup from
    # warmup_bias_lr) — not the norm group.
    if leaf_name == "bias":
        return "bias"
    if any("bn" in str(n) for n in names[:-1]) or leaf_name == "scale":
        return "norm"
    return "weight"


def lr_lambda(epochs: int, lrf: float, cos_lr: bool) -> Callable[[float], float]:
    """Per-epoch LR factor (reference trainer.py:_setup_scheduler)."""
    if cos_lr:
        return lambda e: ((1 - jnp.cos(e * math.pi / epochs)) / 2) * (lrf - 1) + 1
    return lambda e: jnp.maximum(1 - e / epochs, 0) * (1.0 - lrf) + lrf


def warmup_schedules(
    lr0: float,
    lf: Callable[[float], float],
    nb: int,
    warmup_epochs: float,
    warmup_bias_lr: float,
    warmup_momentum: float,
    momentum: float,
):
    """Step-indexed (lr, bias_lr, momentum) schedules.

    Reference trainer.py:785-794: during the first nw = max(warmup_epochs*nb,
    100) steps, LR ramps linearly from 0 (bias: warmup_bias_lr) to
    lr0*lf(epoch) and momentum from warmup_momentum to momentum.
    warmup_epochs <= 0 disables warmup entirely (trainer.py:747 sets nw=-1),
    including the 100-step floor.
    """
    nw = max(round(warmup_epochs * nb), 100) if warmup_epochs > 0 else 0
    if nw == 0:
        lf_t = lambda step: lr0 * lf(jnp.floor(step / nb))
        return lf_t, lf_t, (lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), momentum))

    def lr_at(step, start):
        e = step / nb  # fractional epoch
        target = lr0 * lf(jnp.floor(e))
        frac = jnp.clip(step / nw, 0.0, 1.0)
        warm = start + frac * (target - start)
        return jnp.where(step < nw, warm, target)

    def lr_fn(step):
        return lr_at(step, 0.0)

    def bias_lr_fn(step):
        return lr_at(step, warmup_bias_lr)

    def momentum_fn(step):
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, warmup_momentum + frac * (momentum - warmup_momentum), momentum)

    return lr_fn, bias_lr_fn, momentum_fn


class YoloSGDState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Updates


def yolo_sgd(
    lr_fn, bias_lr_fn, momentum_fn, weight_decay: float, labels, nesterov: bool = True
) -> optax.GradientTransformation:
    """Torch-semantics SGD: g += wd*p (L2, weight group only), buf = mu*buf + g,
    step = -(lr)*(g + mu*buf) if nesterov else -(lr)*buf. Per-group LR during
    warmup (bias group uses bias_lr_fn)."""

    def init(params):
        return YoloSGDState(jnp.zeros([], jnp.int32), jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        step = state.count
        mu = momentum_fn(step)
        lr_w = lr_fn(step)
        lr_b = bias_lr_fn(step)

        def upd(g, p, buf, label):
            if label == "weight" and weight_decay:
                g = g + weight_decay * p
            new_buf = mu * buf + g
            d = g + mu * new_buf if nesterov else new_buf
            lr = lr_b if label == "bias" else lr_w
            return -lr * d, new_buf

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(state.momentum)
        flat_l = jax.tree.leaves(labels)
        out = [upd(g, p, b, l) for g, p, b, l in zip(flat_g, flat_p, flat_b, flat_l)]
        updates = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_buf = jax.tree.unflatten(treedef, [o[1] for o in out])
        return updates, YoloSGDState(step + 1, new_buf)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params,
    name: str,
    lr0: float,
    momentum: float,
    weight_decay: float,
    nb: int,
    epochs: int,
    lrf: float,
    cos_lr: bool,
    warmup_epochs: float,
    warmup_bias_lr: float,
    warmup_momentum: float,
    nc: int = 80,
    clip_norm: float = 10.0,
    accumulate: int = 1,
) -> optax.GradientTransformation:
    """Build the full update chain: clip -> optimizer (-> grad accumulation).

    ``name='auto'`` mirrors the reference's heuristic (trainer.py:1128-1141):
    AdamW with lr = 0.002 * round(nbs-scaled fit) for short runs — here
    simplified to AdamW(lr=0.002, momentum=0.9) when epochs < 50 else SGD.
    """
    labels = jax.tree_util.tree_map_with_path(param_group_label, params)
    if name == "auto":
        if epochs < 50:
            name, lr0, momentum = "AdamW", 0.002, 0.9
        else:
            name = "SGD"
    lf = lr_lambda(epochs, lrf, cos_lr)
    lr_fn, bias_lr_fn, momentum_fn = warmup_schedules(
        lr0, lf, nb, warmup_epochs, warmup_bias_lr, warmup_momentum, momentum
    )
    k_table = ni_table = None
    if accumulate > 1:
        # The reference does NOT step every `accumulate` batches from step 0:
        # during warmup it RAMPS accumulate from 1 to nbs/batch
        # (trainer.py:786) and fires whenever ni - last_opt_step >= accumulate
        # (trainer.py:813) — i.e. the optimizer updates nearly every batch
        # early on, exactly the phase where training dynamics are set.
        # Round-5 controls showed our fixed-k stepping losing the early phase
        # on every config. Precompute the reference's exact firing plan:
        # update u fires at batch ni_table[u] having accumulated k_table[u]
        # batches; MultiSteps + the schedules are driven by these tables.
        k_table, ni_table = _torch_step_plan(
            nb, epochs, warmup_epochs if warmup_epochs > 0 else 0.0, accumulate
        )

        def _at_ni(f, tab=ni_table):
            t = jnp.asarray(tab, jnp.float32)
            return lambda step: f(t[jnp.clip(step, 0, t.shape[0] - 1)])

        lr_fn, bias_lr_fn, momentum_fn = (
            _at_ni(lr_fn), _at_ni(bias_lr_fn), _at_ni(momentum_fn))

    if name == "SGD":
        opt = yolo_sgd(lr_fn, bias_lr_fn, momentum_fn, weight_decay, labels, nesterov=True)
    elif name in ("Adam", "AdamW", "NAdam", "RAdam"):
        maker = {
            "Adam": optax.adam,
            "AdamW": optax.adamw,
            "NAdam": optax.nadam,
            "RAdam": optax.radam,
        }[name]
        kwargs = {"b1": momentum, "b2": 0.999, "eps": 1e-8}
        if name == "AdamW":
            decay_mask = jax.tree.map(lambda l: l == "weight", labels)
            opt = optax.inject_hyperparams(maker)(learning_rate=lr_fn, weight_decay=weight_decay, mask=decay_mask, **kwargs)
        else:
            opt = optax.inject_hyperparams(maker)(learning_rate=lr_fn, **kwargs)
    elif name == "RMSProp":
        opt = optax.inject_hyperparams(optax.rmsprop)(learning_rate=lr_fn, momentum=momentum)
    elif name == "SOAP":
        from experiment_yolo_tpu.optim.soap import soap

        opt = soap(lr_fn, weight_decay=weight_decay, decay_mask=jax.tree.map(lambda l: l == "weight", labels))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    if accumulate > 1:
        # optax.MultiSteps delivers the MEAN of the k accumulated gradients;
        # the reference accumulates grad SUMS via repeated .backward() before
        # stepping (trainer.py:798-817). Scale back to the sum (by the
        # PER-UPDATE k from the firing plan) before the global-norm clip so
        # both the clip threshold and the step magnitude match torch.
        kt_i = jnp.asarray(k_table, jnp.int32)
        kt_f = jnp.asarray(k_table, jnp.float32)

        def _k_int(step):
            return kt_i[jnp.clip(step, 0, kt_i.shape[0] - 1)]

        def _k_float(step):
            return kt_f[jnp.clip(step, 0, kt_f.shape[0] - 1)]

        chain = optax.chain(
            optax.scale_by_schedule(_k_float), optax.clip_by_global_norm(clip_norm), opt
        )
        chain = optax.MultiSteps(chain, every_k_schedule=_k_int)
    else:
        chain = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return chain
