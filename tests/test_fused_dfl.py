"""Analytic custom-VJP DFL decode + hat-DFL loss: value and gradient
equality vs the autodiff forms (ops/anchors.py:dfl_decode_fused,
utils/loss.py:_df_loss_fused). Same math, hand-written backward — these
tests pin the derivation; on-chip timing lives in docs/KERNELS.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.anchors import dfl_decode, dfl_decode_fused
from experiment_yolo_tpu.utils.loss import LossConfig, _df_loss, _df_loss_fused, detection_loss


def _rand(shape, dtype=jnp.float32, scale=6.0, seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32, -scale, scale)
    return x.astype(dtype)


@pytest.mark.parametrize("shape", [(2, 40, 64), (1, 8, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_decode_forward_identical(shape, dtype):
    x = _rand(shape, dtype)
    np.testing.assert_array_equal(
        np.asarray(dfl_decode_fused(x, 16)), np.asarray(dfl_decode(x, 16))
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_decode_gradient_matches_autodiff(dtype):
    x = _rand((2, 16, 64), dtype, seed=2)
    r = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))
    g_ref = jax.grad(lambda a: jnp.sum(dfl_decode(a, 16) * r).astype(jnp.float32))(x)
    g_fus = jax.grad(lambda a: jnp.sum(dfl_decode_fused(a, 16) * r).astype(jnp.float32))(x)
    if dtype == jnp.float32:
        np.testing.assert_allclose(
            np.asarray(g_fus), np.asarray(g_ref), atol=1e-6, rtol=1e-3
        )
    else:
        # bf16: autodiff saves the bf16-rounded exp as its residual while the
        # fused backward recomputes it in f32, so isolated elements can
        # differ by several bf16 ulps. The meaningful property: the fused
        # grad is at least as close to the f32 ground truth as autodiff.
        g_true = jax.grad(
            lambda a: jnp.sum(dfl_decode(a, 16) * r).astype(jnp.float32)
        )(x.astype(jnp.float32))
        err_fus = np.abs(np.asarray(g_fus, np.float32) - np.asarray(g_true))
        err_ref = np.abs(np.asarray(g_ref, np.float32) - np.asarray(g_true))
        assert err_fus.max() <= err_ref.max() + 1e-3
        np.testing.assert_allclose(
            np.asarray(g_fus, np.float32), np.asarray(g_true), atol=5e-2, rtol=5e-2
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_df_loss_fused_value_and_grad(dtype):
    x = _rand((2, 16, 4, 16), dtype, seed=5)
    t = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 4), jnp.float32, 0.0, 15.5)
    np.testing.assert_allclose(
        np.asarray(_df_loss_fused(x, t)), np.asarray(_df_loss(x, t)), atol=1e-6, rtol=1e-6
    )
    r = jax.random.normal(jax.random.PRNGKey(7), (2, 16))
    g_ref = jax.grad(lambda a: jnp.sum(_df_loss(a, t) * r))(x)
    g_fus = jax.grad(lambda a: jnp.sum(_df_loss_fused(a, t) * r))(x)
    atol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(g_fus, np.float32), np.asarray(g_ref, np.float32), atol=atol, rtol=1e-3
    )


def test_df_loss_fused_target_tangent_zero():
    x = _rand((2, 8, 4, 16), seed=9)
    t = jax.random.uniform(jax.random.PRNGKey(10), (2, 8, 4), jnp.float32, 0.0, 15.5)
    g_t = jax.grad(lambda tt: jnp.sum(_df_loss_fused(x, tt)))(t)
    np.testing.assert_array_equal(np.asarray(g_t), 0.0)


def test_df_loss_fused_clamped_edge_target():
    """target > reg_max-1 collapses both bins onto reg_max-1 (reference
    clipped edge case) — fused grad must match autodiff there too."""
    x = _rand((1, 4, 4, 16), seed=11)
    t = jnp.full((1, 4, 4), 15.7, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_df_loss_fused(x, t)), np.asarray(_df_loss(x, t)), atol=1e-6
    )
    g_ref = jax.grad(lambda a: jnp.sum(_df_loss(a, t)))(x)
    g_fus = jax.grad(lambda a: jnp.sum(_df_loss_fused(a, t)))(x)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref), atol=1e-6, rtol=1e-5)


def test_fused_stable_under_extreme_logits():
    x = np.zeros((1, 2, 64), np.float32)
    x[0, 0, :] = 200.0
    x[0, 1, :] = -200.0
    xj = jnp.asarray(x)
    np.testing.assert_allclose(
        np.asarray(dfl_decode_fused(xj, 16)), np.asarray(dfl_decode(xj, 16)), atol=1e-6
    )
    r = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4))
    g = jax.grad(lambda a: jnp.sum(dfl_decode_fused(a, 16) * r))(xj)
    g_ref = jax.grad(lambda a: jnp.sum(dfl_decode(a, 16) * r))(xj)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)

    t = jnp.full((1, 2, 4), 7.25, jnp.float32)
    lf = _df_loss_fused(xj.reshape(1, 2, 4, 16), t)
    lr = _df_loss(xj.reshape(1, 2, 4, 16), t)
    assert np.isfinite(np.asarray(lf)).all()
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), atol=1e-5, rtol=1e-6)


@pytest.mark.parametrize("checkpoint", [False, True])
def test_loss_path_fused_equals_unfused(checkpoint):
    """detection_loss with fused_dfl matches fused_dfl=False in value AND
    gradient, with and without loss checkpointing."""
    feats = [
        _rand((2, 8, 8, 64 + 3), seed=3, scale=2.0),
        _rand((2, 4, 4, 64 + 3), seed=4, scale=2.0),
    ]
    batch = {
        "bboxes": jnp.asarray(np.random.RandomState(0).uniform(0.3, 0.6, (2, 5, 4)), jnp.float32),
        "cls": jnp.zeros((2, 5), jnp.int32),
        "mask": jnp.asarray(np.tile(np.arange(5) < 2, (2, 1))),
    }

    def total(cfg, fs):
        t, comps, _ = detection_loss(fs, batch, (8, 16), cfg)
        return t, comps

    kw = dict(nc=3, checkpoint_loss=checkpoint)
    base, bc = total(LossConfig(fused_dfl=False, **kw), feats)
    got, gc = total(LossConfig(fused_dfl=True, **kw), feats)
    for k in ("box", "cls", "dfl"):
        np.testing.assert_allclose(float(gc[k]), float(bc[k]), atol=1e-5, rtol=1e-5)

    g_ref = jax.grad(lambda fs: total(LossConfig(fused_dfl=False, **kw), fs)[0])(feats)
    g_got = jax.grad(lambda fs: total(LossConfig(fused_dfl=True, **kw), fs)[0])(feats)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
