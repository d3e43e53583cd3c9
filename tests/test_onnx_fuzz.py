"""Property/fuzz test for the jaxpr->ONNX compiler + numpy interpreter.

The ONNX path is homegrown (export/onnx_export.py compiles jaxprs,
export/onnx_runtime_np.py executes the protobuf) — the model-level tests
only exercise the op sequences our networks happen to emit. This generator
composes random pipelines from the supported primitive vocabulary and
checks output equality vs running the same function in JAX, so new
primitive lowerings get cross-checked structurally, not just via the
golden models. (Mirrors the reference's kernel-vs-reference equivalence
pattern, SURVEY §4.1 — here compiler-vs-tracer.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.export.onnx_export import export_jaxpr_to_onnx
from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx


def _random_program(rng: np.random.RandomState, n_ops: int = 8):
    """Build (fn, example_input). fn composes n_ops random primitives over a
    growing pool of intermediate values, all float32 and NaN-safe."""
    in_shape = tuple(rng.randint(2, 5, size=rng.randint(2, 5)))

    ops = []
    for _ in range(n_ops):
        ops.append(rng.randint(0, 12))
    params = rng.randint(0, 10_000, size=n_ops * 4)

    def fn(x):
        pool = [x]
        pi = iter(params)

        def pick():
            return pool[int(next(pi)) % len(pool)]

        for k, op in enumerate(ops):
            a = pick()
            if op == 0:  # binary elementwise (broadcast-safe: same shape)
                b = pick()
                if b.shape != a.shape:
                    b = jnp.zeros(a.shape, a.dtype) + jnp.mean(b)
                which = int(next(pi)) % 5
                a = [jnp.add, jnp.subtract, jnp.multiply, jnp.maximum, jnp.minimum][which](a, b)
            elif op == 1:  # unary
                which = int(next(pi)) % 8
                a = [jnp.tanh, jax.nn.sigmoid, jnp.sin, jnp.cos, jnp.abs,
                     lambda t: jnp.sqrt(jnp.abs(t) + 0.1),
                     lambda t: jnp.log(jnp.abs(t) + 0.5),
                     lambda t: jnp.exp(jnp.clip(t, -4, 4))][which](a)
            elif op == 2:  # reduction over one axis, keepdims
                ax = int(next(pi)) % a.ndim
                which = int(next(pi)) % 3
                a = [jnp.sum, jnp.max, jnp.min][which](a, axis=ax, keepdims=True)
            elif op == 3:  # transpose (random perm)
                perm = list(range(a.ndim))
                i, j = int(next(pi)) % a.ndim, int(next(pi)) % a.ndim
                perm[i], perm[j] = perm[j], perm[i]
                a = jnp.transpose(a, perm)
            elif op == 4:  # reshape (merge two adjacent dims)
                if a.ndim >= 2:
                    i = int(next(pi)) % (a.ndim - 1)
                    sh = a.shape[:i] + (a.shape[i] * a.shape[i + 1],) + a.shape[i + 2:]
                    a = jnp.reshape(a, sh)
            elif op == 5:  # slice (halve one axis)
                ax = int(next(pi)) % a.ndim
                if a.shape[ax] >= 2:
                    a = jax.lax.slice_in_dim(a, 0, a.shape[ax] // 2 * 2, 2, axis=ax)
            elif op == 6:  # concat with self along a random axis
                ax = int(next(pi)) % a.ndim
                a = jnp.concatenate([a, a * 0.5], axis=ax)
            elif op == 7:  # pad one axis
                ax = int(next(pi)) % a.ndim
                pads = [(0, 0)] * a.ndim
                pads[ax] = (1, 1)
                a = jnp.pad(a, pads, constant_values=0.25)
            elif op == 8:  # where/select
                b = pick()
                if b.shape != a.shape:
                    b = jnp.zeros(a.shape, a.dtype) + jnp.mean(b)
                a = jnp.where(a > b, a, b * 0.5)
            elif op == 9:  # clamp
                a = jnp.clip(a, -2.0, 2.0)
            elif op == 10:  # matmul over trailing dims
                if a.ndim >= 2:
                    w = jnp.asarray(np.linspace(-1, 1, a.shape[-1] * 3,
                                                dtype=np.float32).reshape(a.shape[-1], 3))
                    a = a @ w
            else:  # rev (flip one axis)
                ax = int(next(pi)) % a.ndim
                a = jnp.flip(a, axis=ax)
            pool.append(a)
        # single scalar-free output: sum-join the pool tails
        out = pool[-1]
        return out

    x = rng.uniform(-2, 2, in_shape).astype(np.float32)
    return fn, x


@pytest.mark.parametrize("seed", range(25))
def test_random_pipeline_round_trips(seed):
    rng = np.random.RandomState(seed)
    fn, x = _random_program(rng, n_ops=8)
    want = np.asarray(fn(jnp.asarray(x)))
    cj = jax.make_jaxpr(fn)(jnp.asarray(x))
    blob = export_jaxpr_to_onnx(cj, ["x"], ["y"])
    got = run_onnx(blob, {"x": x})[0]
    assert got.shape == want.shape, (seed, got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5, err_msg=f"seed={seed}")


def test_conv_pool_pipeline_round_trips():
    """Conv + pool + activation chains (the layout-sensitive lowerings)."""
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    w1 = rng.uniform(-0.5, 0.5, (3, 3, 3, 8)).astype(np.float32)
    w2 = rng.uniform(-0.5, 0.5, (1, 1, 8, 4)).astype(np.float32)

    def fn(x):
        y = jax.lax.conv_general_dilated(x, jnp.asarray(w1), (2, 2), "SAME",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.silu(y)
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        y = jax.lax.conv_general_dilated(y, jnp.asarray(w2), (1, 1), "SAME",
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.concatenate([y, -y], axis=-1)

    want = np.asarray(fn(jnp.asarray(x)))
    blob = export_jaxpr_to_onnx(jax.make_jaxpr(fn)(jnp.asarray(x)), ["x"], ["y"])
    got = run_onnx(blob, {"x": x})[0]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
