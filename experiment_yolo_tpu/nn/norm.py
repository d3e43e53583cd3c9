"""Memory-optimal BatchNorm (+fused activation) — drop-in for flax BatchNorm.

flax's BatchNorm saves TWO f32 copies of the activation for the backward
pass (``x - mean`` from ``_normalize`` and ``x*x`` from ``_abs_sq``), and a
following SiLU saves a THIRD (its input) — measured 14.8 GB of the DEAL-LD
train step's 22 GB residuals. Here train-mode normalize (+ optional fused
activation) is ONE ``custom_vjp`` whose only large residual is the original
bf16 input (which the preceding conv already saved); the backward recomputes
x_hat / the activation input (cheap elementwise) and applies the analytic BN
backward:

    x_hat = (x - m) * r,  r = rsqrt(v + eps),  y = g * x_hat + b
    db = sum(dy);  dg = sum(dy * x_hat)
    dx = g * r * (dy - db/N - x_hat * dg/N)

Parameter/stats layout is flax-identical ('scale'/'bias' params,
'mean'/'var' batch_stats, biased variance, retention-factor momentum), so
checkpoints and the torch weight converter are unaffected. The batch mean /
variance are returned from the same fused pass for the running-stat update
(no second stats sweep).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _apply_act(name, y):
    if name in (None, False, "identity"):
        return y
    if name in (True, "silu"):
        return jax.nn.silu(y)
    if name == "relu":
        return jax.nn.relu(y)
    if name == "leaky_relu_0.1":
        return jax.nn.leaky_relu(y, 0.1)
    if name == "sigmoid":
        return jax.nn.sigmoid(y)
    raise ValueError(f"unknown activation {name!r}")


def _act_grad(name, y):
    """d act(y) / d y, elementwise, given the PRE-activation y."""
    if name in (None, False, "identity"):
        return jnp.ones_like(y)
    if name in (True, "silu"):
        s = jax.nn.sigmoid(y)
        return s * (1.0 + y * (1.0 - s))
    if name == "relu":
        return (y > 0).astype(y.dtype)
    if name == "leaky_relu_0.1":
        return jnp.where(y > 0, 1.0, 0.1).astype(y.dtype)
    if name == "sigmoid":
        s = jax.nn.sigmoid(y)
        return s * (1.0 - s)
    raise ValueError(f"unknown activation {name!r}")


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_act_train(x, gamma, beta, eps, act):
    out, _ = _bn_act_fwd(x, gamma, beta, eps, act)
    return out


def _bn_act_fwd(x, gamma, beta, eps, act):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    m = xf.mean(axes)
    v = (xf * xf).mean(axes) - m * m  # biased, single-pass (flax _abs_sq form)
    r = jax.lax.rsqrt(v + eps)
    y = (xf - m) * r * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    out = _apply_act(act, y.astype(x.dtype))
    return (out, m, v), (x, gamma, beta, m, r)


def _bn_act_bwd(eps, act, res, cts):
    x, gamma, beta, m, r = res
    dout = cts[0].astype(jnp.float32)  # cotangents of (out, m, v); stats get none
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    n = xf.size // xf.shape[-1]
    xhat = (xf - m) * r
    y = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    # activation backward on the recomputed pre-activation (same dtype chain
    # as forward: act applied in x.dtype)
    dy = dout * _act_grad(act, y.astype(x.dtype)).astype(jnp.float32)
    dbeta = dy.sum(axes)
    dgamma = (dy * xhat).sum(axes)
    dx = (gamma.astype(jnp.float32) * r) * (dy - dbeta / n - xhat * (dgamma / n))
    return dx.astype(x.dtype), dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


_bn_act_train.defvjp(
    lambda x, g, b, eps, act: _bn_act_fwd(x, g, b, eps, act),
    _bn_act_bwd,
)


class BatchNorm(nn.Module):
    """flax-compatible BatchNorm with the memory-optimal train backward.

    ``act`` optionally fuses the following activation into the same
    custom-vjp (silu | relu | leaky_relu_0.1 | sigmoid | None) so its input
    need not be saved either. Reduction is over all axes but the last.
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32
    use_scale: bool = True
    use_bias: bool = True
    scale_init: Any = nn.initializers.ones
    bias_init: Any = nn.initializers.zeros
    act: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        if self.dtype is not None:
            x = x.astype(self.dtype)  # flax semantics: dtype = compute dtype
        ura = self.use_running_average if use_running_average is None else use_running_average
        c = x.shape[-1]
        scale = (
            self.param("scale", self.scale_init, (c,), self.param_dtype)
            if self.use_scale
            else jnp.ones((c,), self.param_dtype)
        )
        bias = (
            self.param("bias", self.bias_init, (c,), self.param_dtype)
            if self.use_bias
            else jnp.zeros((c,), self.param_dtype)
        )
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if ura:
            r = jax.lax.rsqrt(ra_var.value + self.epsilon)
            g = (scale.astype(jnp.float32) * r).astype(x.dtype)
            b = (bias.astype(jnp.float32) - ra_mean.value * scale.astype(jnp.float32) * r).astype(x.dtype)
            return _apply_act(self.act, x * g + b)

        out, m, v = _bn_act_train(x, scale, bias, self.epsilon, self.act)
        if not self.is_initializing():
            m = jax.lax.stop_gradient(m)
            v = jax.lax.stop_gradient(v)
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * m
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * v
        return out
