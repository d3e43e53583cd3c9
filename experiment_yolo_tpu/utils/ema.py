"""Exponential moving average of model state.

Counterpart of the reference's ``ModelEMA`` (utils/torch_utils.py:431):
decay ramps as ``decay * (1 - exp(-updates / tau))`` so early updates move
fast; EMA covers params AND BN running stats (the reference copies all
float buffers). Pure function over pytrees — state lives in TrainState.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(updates: jnp.ndarray, decay: float = 0.9999, tau: float = 2000.0) -> jnp.ndarray:
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_tree, new_tree, updates: jnp.ndarray, decay: float = 0.9999, tau: float = 2000.0):
    """ema <- d*ema + (1-d)*new, with ramped decay."""
    d = ema_decay(updates, decay, tau)
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_tree, new_tree)
