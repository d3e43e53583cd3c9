"""Lane-packed DFL decode (XLA + Pallas): forward and gradient equality vs
the jnp reference (ops/anchors.py:dfl_decode). Pallas runs in interpret
mode on CPU; the real-TPU timing lives in the chip queue."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.anchors import dfl_decode, dfl_decode_packed
from experiment_yolo_tpu.ops.pallas.dfl_decode import dfl_decode_pallas


def _rand(shape, dtype=jnp.float32, scale=6.0, seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32,
                           -scale, scale)
    return x.astype(dtype)


@pytest.mark.parametrize("shape", [(2, 40, 64), (1, 8, 64), (3, 10, 64)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_packed_forward_matches(shape, dtype):
    x = _rand(shape, dtype)
    want = dfl_decode(x, 16)
    got = dfl_decode_packed(x, 16)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2  # bf16 exp spacing
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol, rtol=1e-3)


def test_packed_fallback_on_indivisible():
    x = _rand((1, 3, 64))  # 3*64 not % 128
    np.testing.assert_allclose(
        np.asarray(dfl_decode_packed(x, 16)), np.asarray(dfl_decode(x, 16)), atol=1e-6
    )


def test_packed_gradient_matches():
    x = _rand((2, 16, 64))
    r = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4))

    def loss(fn, xx):
        return jnp.sum(fn(xx, 16) * r)

    g_ref = jax.grad(lambda xx: loss(dfl_decode, xx))(x)
    g_pk = jax.grad(lambda xx: loss(dfl_decode_packed, xx))(x)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_forward_matches(dtype):
    x = _rand((2, 32, 64), dtype)
    want = dfl_decode(x.astype(jnp.float32), 16)  # pallas computes exp in f32
    got = dfl_decode_pallas(x, 16, True)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol, rtol=1e-3)


def test_pallas_analytic_vjp_matches_autodiff():
    x = _rand((2, 32, 64))
    r = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 4))
    g_ref = jax.grad(lambda xx: jnp.sum(dfl_decode(xx, 16) * r))(x)
    g_pl = jax.grad(lambda xx: jnp.sum(dfl_decode_pallas(xx, 16, True) * r))(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


def test_pallas_fallback_gradient():
    x = _rand((1, 3, 64))  # indivisible -> jnp fallback path inside custom_vjp
    r = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4))
    g_ref = jax.grad(lambda xx: jnp.sum(dfl_decode(xx, 16) * r))(x)
    g_pl = jax.grad(lambda xx: jnp.sum(dfl_decode_pallas(xx, 16, True) * r))(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


def test_inference_predict_packed_matches():
    """DetectionModel(packed_decode=True).predict == default predict."""
    from pathlib import Path

    from experiment_yolo_tpu.nn.tasks import DetectionModel

    yml = str(Path(__file__).parent / "assets" / "tiny.yaml")
    m0 = DetectionModel(yml)
    m1 = DetectionModel(yml, packed_decode=True)
    v = m0.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for a, b in zip(m1.predict(v, x), m0.predict(v, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_df_loss_packed_matches(dtype):
    from experiment_yolo_tpu.utils.loss import _df_loss, _df_loss_packed

    x = _rand((2, 16, 64), dtype, seed=5)
    t = jax.random.uniform(jax.random.PRNGKey(6), (2, 16, 4), jnp.float32, 0.0, 15.5)
    want = _df_loss(x.reshape(2, 16, 4, 16), t)
    got = _df_loss_packed(x, t, 16)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol, rtol=1e-3)

    if dtype == jnp.float32:
        r = jax.random.normal(jax.random.PRNGKey(7), (2, 16))
        g_ref = jax.grad(lambda xx: jnp.sum(_df_loss(xx.reshape(2, 16, 4, 16), t) * r))(x)
        g_pk = jax.grad(lambda xx: jnp.sum(_df_loss_packed(xx, t, 16) * r))(x)
        np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


def test_df_loss_packed_fallback():
    from experiment_yolo_tpu.utils.loss import _df_loss, _df_loss_packed

    x = _rand((1, 3, 64), seed=8)  # 3*64 not % 128
    t = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 4), jnp.float32, 0.0, 15.5)
    np.testing.assert_allclose(
        np.asarray(_df_loss_packed(x, t, 16)),
        np.asarray(_df_loss(x.reshape(1, 3, 4, 16), t)), atol=1e-6,
    )


@pytest.mark.parametrize("mode", ["xla", "pallas"])
def test_loss_path_packed_equals_default(mode):
    """detection_loss with packed decode matches the default decode path,
    in value AND gradient."""
    from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss

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

    base, bc = total(LossConfig(nc=3), feats)
    got, gc = total(LossConfig(nc=3, packed_decode=mode), feats)
    for k in ("box", "cls", "dfl"):
        np.testing.assert_allclose(float(gc[k]), float(bc[k]), atol=1e-4, rtol=1e-4)

    g_ref = jax.grad(lambda fs: total(LossConfig(nc=3), fs)[0])(feats)
    g_got = jax.grad(lambda fs: total(LossConfig(nc=3, packed_decode=mode), fs)[0])(feats)
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_packed_stable_under_cross_group_spread():
    """Regression: a row-global max shift underflows a neighbouring anchor's
    whole group (den=0 -> NaN) when logit spreads exceed exp's range. The
    packed decode/loss must match the unpacked form even at extreme spreads."""
    from experiment_yolo_tpu.utils.loss import _df_loss, _df_loss_packed

    x = np.zeros((1, 2, 64), np.float32)
    x[0, 0, :] = 200.0   # anchor 0: huge logits
    x[0, 1, :] = -200.0  # anchor 1 (same 128-lane row): tiny logits
    xj = jnp.asarray(x)

    want = dfl_decode(xj, 16)
    got_x = dfl_decode_packed(xj, 16)
    got_p = dfl_decode_pallas(xj, 16, True)
    assert np.isfinite(np.asarray(got_x)).all() and np.isfinite(np.asarray(got_p)).all()
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want), atol=1e-5)

    # gradients stay finite and match through both packed paths
    r = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4))
    g_ref = jax.grad(lambda a: jnp.sum(dfl_decode(a, 16) * r))(xj)
    for fn in (lambda a: dfl_decode_packed(a, 16), lambda a: dfl_decode_pallas(a, 16, True)):
        g = jax.grad(lambda a: jnp.sum(fn(a) * r))(xj)
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)

    # the packed DFL loss: same row-sharing layout, same hazard
    t = jnp.full((1, 2, 4), 7.25, jnp.float32)
    want_l = _df_loss(xj.reshape(1, 2, 4, 16), t)
    got_l = _df_loss_packed(xj, t, 16)
    assert np.isfinite(np.asarray(got_l)).all()
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l), atol=1e-4, rtol=1e-5)
