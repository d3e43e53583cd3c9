"""Dense hat-window LDConv sampler vs the exact packed gather.

The dense path (nn/modules.py ldconv_hat_sample) must be numerically
indistinguishable from the exact 4-corner gather — values AND gradients,
including the right-derivative convention at integer offsets (the zero-init
point) and the zero offset-gradient at borders. Matches the sampling math of
reference ultralytics/nn/modules/conv.py:389-470.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.modules import (
    LDConv,
    _ldconv_grid_pts,
    ldconv_bilinear_gather,
    ldconv_hat_sample,
    ldconv_hat_taps,
    ldconv_sample_grid,
)


def _abs_positions(off_r, off_c, num_param, stride, R):
    """Absolute sample positions in replicate-padded coords (matches LDConv)."""
    _, h, w, _ = off_r.shape
    p_n = ldconv_sample_grid(num_param)
    gr = jnp.arange(h, dtype=jnp.float32)[:, None] * stride + R
    gc = jnp.arange(w, dtype=jnp.float32)[None, :] * stride + R
    pr = gr[None, :, :, None] + p_n[None, None, None, :, 0] + off_r
    pc = gc[None, :, :, None] + p_n[None, None, None, :, 1] + off_c
    return jnp.stack([pr, pc], axis=-1)


def _padded(x, h, w, num_param, stride, R):
    hx, wx = x.shape[1], x.shape[2]
    pts = _ldconv_grid_pts(num_param)
    max_pr = max(p[0] for p in pts)
    max_pc = max(p[1] for p in pts)
    pad_r = max(0, (h - 1) * stride + max_pr + R + 2 - hx)
    pad_c = max(0, (w - 1) * stride + max_pc + R + 2 - wx)
    return jnp.pad(x, ((0, 0), (R, pad_r), (R, pad_c), (0, 0)), mode="edge")


@pytest.mark.parametrize("num_param,stride", [(1, 1), (3, 1), (3, 2), (4, 2), (5, 1)])
def test_hat_sampler_matches_gather(num_param, stride):
    R = 2
    rng = np.random.RandomState(0)
    b, hx, wx, c = 2, 23, 25, 5
    h = (hx + stride - 1) // stride
    w = (wx + stride - 1) // stride
    x = jnp.asarray(rng.randn(b, hx, wx, c).astype(np.float32))
    off = jnp.asarray(
        rng.uniform(-R, R + 0.99, (b, h, w, 2, num_param)).astype(np.float32))
    off_r, off_c = off[..., 0, :], off[..., 1, :]
    xp = _padded(x, h, w, num_param, stride, R)
    p = _abs_positions(off_r, off_c, num_param, stride, R)
    g = ldconv_bilinear_gather(xp, p).reshape(b, h, w, num_param * c)
    d = ldconv_hat_sample(xp, off_r, off_c, num_param, stride, R)
    np.testing.assert_allclose(np.asarray(d), np.asarray(g), atol=2e-5, rtol=0)


def test_hat_taps_partition_of_unity_and_grad_convention():
    R = 2
    off = jnp.asarray([-2.0, -1.3, -0.0, 0.0, 0.4, 1.0, 2.0, 2.9], jnp.float32)
    wts = ldconv_hat_taps(off, R)
    np.testing.assert_allclose(np.asarray(wts.sum(-1)), 1.0, atol=1e-6)
    # weights live on corners floor(off) and floor(off)+1 only
    taps = np.arange(-R, R + 2)
    for i, o in enumerate(np.asarray(off)):
        fl = np.floor(o)
        nz = np.nonzero(np.asarray(wts)[i])[0]
        assert set(taps[nz]) <= {fl, fl + 1}
    # d(sampled)/d(off) at INTEGER offsets must be the right-derivative
    # x[fl+1]-x[fl], not the hat kink's zero — else zero-init offsets freeze
    xs = jnp.asarray([3.0, 5.0, 11.0, 17.0, 23.0, 31.0], jnp.float32)

    def interp(o):
        return (ldconv_hat_taps(o, R) * xs).sum()

    for o, want in [(0.0, 17.0 - 11.0), (1.0, 23.0 - 17.0), (-1.0, 11.0 - 5.0),
                    (0.5, 17.0 - 11.0)]:
        got = float(jax.grad(interp)(jnp.float32(o)))
        assert got == pytest.approx(want), (o, got, want)


def test_hat_sampler_gradients_match_gather():
    R = 2
    num_param, stride = 3, 2
    rng = np.random.RandomState(1)
    b, hx, wx, c = 2, 17, 19, 4
    h, w = (hx + 1) // 2, (wx + 1) // 2
    x = jnp.asarray(rng.randn(b, hx, wx, c).astype(np.float32))
    # include offsets that push samples past the borders (grad must be 0 there)
    off = jnp.asarray(rng.uniform(-2.0, 2.9, (b, h, w, 2, num_param)).astype(np.float32))
    t = jnp.asarray(rng.randn(b, h, w, num_param * c).astype(np.float32))

    def loss_dense(x_, off_):
        xp = _padded(x_, h, w, num_param, stride, R)
        d = ldconv_hat_sample(xp, off_[..., 0, :], off_[..., 1, :], num_param, stride, R)
        return (d * t).sum()

    def loss_gather(x_, off_):
        xp = _padded(x_, h, w, num_param, stride, R)
        p = _abs_positions(off_[..., 0, :], off_[..., 1, :], num_param, stride, R)
        g = ldconv_bilinear_gather(xp, p).reshape(b, h, w, num_param * c)
        return (g * t).sum()

    gd = jax.grad(loss_dense, argnums=(0, 1))(x, off)
    gg = jax.grad(loss_gather, argnums=(0, 1))(x, off)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(gg[0]), atol=3e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(gg[1]), atol=3e-4, rtol=0)


def _ld_variants(c2=16, num_param=3, stride=2, **kw):
    return {m: LDConv(c2=c2, num_param=num_param, stride=stride, sampling=m, **kw)
            for m in ("dense", "gather", "auto")}


def _params_with_bias(mod, x, lo, hi, seed=1):
    v = mod.init(jax.random.PRNGKey(0), x)
    vd = flax.core.unfreeze(v)
    bias = vd["params"]["p_conv"]["bias"]
    vd["params"]["p_conv"]["bias"] = jax.random.uniform(
        jax.random.PRNGKey(seed), bias.shape, jnp.float32, lo, hi)
    return flax.core.freeze(vd)


def test_ldconv_module_paths_agree_in_window():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 41, 8), jnp.float32)
    mods = _ld_variants()
    v = _params_with_bias(mods["dense"], x, -1.9, 1.9)
    outs = {m: np.asarray(mod.apply(v, x)) for m, mod in mods.items()}
    np.testing.assert_allclose(outs["dense"], outs["gather"], atol=3e-5, rtol=0)
    # auto takes the dense branch (offsets in-window); tiny drift allowed —
    # the cond-wrapped branch fuses slightly differently than the direct call
    np.testing.assert_allclose(outs["auto"], outs["dense"], atol=2e-6, rtol=0)


def test_ldconv_auto_falls_back_out_of_window():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 41, 8), jnp.float32)
    mods = _ld_variants()
    # offsets beyond R=2: auto must route to the exact gather path
    v = _params_with_bias(mods["auto"], x, 3.5, 4.5)
    oa = np.asarray(mods["auto"].apply(v, x))
    og = np.asarray(mods["gather"].apply(v, x))
    np.testing.assert_allclose(oa, og, atol=2e-6, rtol=0)


def test_ldconv_chunked_matches_unchunked():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 8), jnp.float32)
    big = LDConv(c2=16, num_param=3, stride=2, sampling="auto")
    small = LDConv(c2=16, num_param=3, stride=2, sampling="auto",
                   chunk_budget=64 * 1024)  # force multi-chunk scan
    v = _params_with_bias(big, x, -1.5, 1.5)
    yb = np.asarray(big.apply(v, x))
    ys = np.asarray(small.apply(v, x))
    np.testing.assert_allclose(ys, yb, atol=3e-5, rtol=0)
    # and the fallback inside the scan still works
    v2 = _params_with_bias(big, x, 4.0, 5.0)
    yb2 = np.asarray(big.apply(v2, x))
    ys2 = np.asarray(small.apply(v2, x))
    np.testing.assert_allclose(ys2, yb2, atol=3e-5, rtol=0)


def test_ldconv_module_grads_agree():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, 24, 6), jnp.float32)
    mods = _ld_variants(c2=12)
    v = _params_with_bias(mods["dense"], x, -1.2, 1.2)

    def loss(variables, mod):
        return (mod.apply(variables, x, train=True,
                          mutable=["batch_stats"])[0] ** 2).sum()

    flat = {m: flax.traverse_util.flatten_dict(
                jax.grad(loss)(v, mod)["params"])
            for m, mod in mods.items()}
    for k in flat["dense"]:
        a, g = np.asarray(flat["dense"][k]), np.asarray(flat["gather"][k])
        np.testing.assert_allclose(a, g, atol=5e-4, rtol=0, err_msg=str(k))
    # offset-conv kernel gradient must be nonzero despite zero-ish offsets:
    # the one-hot floor form carries the finite-difference gradient
    pk = flat["dense"][("p_conv", "kernel")]
    assert np.abs(pk).max() > 0


def test_ldconv_bf16_smoke():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 8), jnp.float32)
    mod = LDConv(c2=16, num_param=3, stride=1, sampling="auto", dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert y.dtype == jnp.bfloat16 and y.shape == (2, 16, 16, 16)
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
