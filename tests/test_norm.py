"""Memory-optimal BatchNorm: numerical golden vs flax.linen.BatchNorm
(forward train/eval, gradients, running-stat updates) + residual-size check."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from experiment_yolo_tpu.nn.norm import BatchNorm


def _pair(dtype=jnp.float32, momentum=0.97, eps=1e-3, train=True):
    ours = BatchNorm(use_running_average=not train, momentum=momentum, epsilon=eps,
                     dtype=dtype, param_dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=not train, momentum=momentum, epsilon=eps,
                       dtype=dtype, param_dtype=jnp.float32)
    return ours, ref


def test_forward_and_stats_match_flax_train():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32)) * 3 + 1
    ours, ref = _pair(train=True)
    vo = ours.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # same random init layout
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), vo, vr)
    yo, uo = ours.apply(vo, x, mutable=["batch_stats"])
    yr, ur = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(yo, yr, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
                 uo["batch_stats"], ur["batch_stats"])


def test_forward_matches_flax_eval():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 5, 8).astype(np.float32))
    ours, ref = _pair(train=False)
    v = ref.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda a: a, v)
    # non-trivial stats
    v = {"params": v["params"],
         "batch_stats": {"mean": jnp.asarray(rng.randn(8), jnp.float32),
                         "var": jnp.asarray(np.abs(rng.randn(8)) + 0.5, jnp.float32)}}
    yo = ours.apply(v, x)
    yr = ref.apply(v, x)
    np.testing.assert_allclose(yo, yr, atol=1e-5)


def test_gradients_match_flax():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 6, 6, 12).astype(np.float32)) * 2
    t = jnp.asarray(rng.randn(4, 6, 6, 12).astype(np.float32))
    ours, ref = _pair(train=True)
    v = ref.init(jax.random.PRNGKey(0), x)

    def loss(mod, params, x):
        y, _ = mod.apply({"params": params, "batch_stats": v["batch_stats"]}, x,
                         mutable=["batch_stats"])
        return ((y - t) ** 2).sum()

    go_p, go_x = jax.grad(lambda p, xx: loss(ours, p, xx), argnums=(0, 1))(v["params"], x)
    gr_p, gr_x = jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(go_x, gr_x, atol=1e-3, rtol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-4), go_p, gr_p)


def test_bf16_compute_dtype():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32)).astype(jnp.bfloat16)
    ours, ref = _pair(dtype=jnp.bfloat16, train=True)
    v = ref.init(jax.random.PRNGKey(0), x)
    yo, _ = ours.apply(v, x, mutable=["batch_stats"])
    yr, _ = ref.apply(v, x, mutable=["batch_stats"])
    assert yo.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(yo, np.float32), np.asarray(yr, np.float32), atol=3e-2)


def test_backward_residuals_are_small():
    """The whole point: no f32 activation-sized residuals saved for bwd."""
    import io
    import re
    from contextlib import redirect_stdout

    from jax.ad_checkpoint import print_saved_residuals

    x = jnp.zeros((8, 32, 32, 16), jnp.bfloat16)
    ours = BatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    v = ours.init(jax.random.PRNGKey(0), x)

    def f(params, x):
        y, _ = ours.apply({"params": params, "batch_stats": v["batch_stats"]}, x,
                          mutable=["batch_stats"])
        return (y * y).sum().astype(jnp.float32)

    buf = io.StringIO()
    with redirect_stdout(buf):
        print_saved_residuals(f, v["params"], x)
    big_f32 = [ln for ln in buf.getvalue().splitlines()
               if re.search(r"f32\[8,32,32,16\]", ln)]
    assert not big_f32, f"f32 activation residuals saved:\n" + "\n".join(big_f32)
