"""Selective-scan kernel vs reference equivalence (the reference repo's
mamba test pattern: kernel vs pure-framework on random tensors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.pallas.selective_scan import (
    selective_scan_pallas,
    selective_scan_reference,
)


def _inputs(b=2, l=16, d=8, n=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (b, l, d))
    dt = jax.nn.softplus(jax.random.normal(ks[1], (b, l, d)))
    a_mat = -jnp.exp(jax.random.normal(ks[2], (d, n)))  # stable: A < 0
    b_seq = jax.random.normal(ks[3], (b, l, n))
    c_seq = jax.random.normal(ks[4], (b, l, n))
    d_vec = jax.random.normal(ks[5], (d,))
    return x, dt, a_mat, b_seq, c_seq, d_vec


def test_reference_matches_naive_loop():
    x, dt, a_mat, b_seq, c_seq, d_vec = _inputs()
    y = selective_scan_reference(x, dt, a_mat, b_seq, c_seq, d_vec)
    # naive per-step recurrence
    b, l, d = x.shape
    n = a_mat.shape[1]
    h = np.zeros((b, d, n))
    ys = []
    xn, dtn, an, bn, cn = map(np.asarray, (x, dt, a_mat, b_seq, c_seq))
    for t in range(l):
        da = np.exp(dtn[:, t, :, None] * an[None])
        h = h * da + dtn[:, t, :, None] * bn[:, t, None, :] * xn[:, t, :, None]
        ys.append(np.einsum("bdn,bn->bd", h, cn[:, t]))
    y_naive = np.stack(ys, 1) + xn * np.asarray(d_vec)[None, None]
    np.testing.assert_allclose(np.asarray(y), y_naive, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_reference(seed):
    x, dt, a_mat, b_seq, c_seq, d_vec = _inputs(seed=seed)
    ref = selective_scan_reference(x, dt, a_mat, b_seq, c_seq, d_vec)
    got = selective_scan_pallas(x, dt, a_mat, b_seq, c_seq, d_vec, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_long_sequence_stability():
    x, dt, a_mat, b_seq, c_seq, _ = _inputs(l=256)
    y = selective_scan_reference(x, dt, a_mat, b_seq, c_seq)
    assert bool(jnp.isfinite(y).all())
