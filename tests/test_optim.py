"""Optimizer tests: schedules, param grouping, SGD semantics, SOAP."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from experiment_yolo_tpu.optim.builders import (
    build_optimizer,
    lr_lambda,
    param_group_label,
    warmup_schedules,
)
from experiment_yolo_tpu.optim.soap import soap


def test_lr_lambda_linear_and_cosine():
    lf = lr_lambda(epochs=100, lrf=0.01, cos_lr=False)
    assert lf(0) == pytest.approx(1.0)
    assert lf(100) == pytest.approx(0.01)
    lfc = lr_lambda(epochs=100, lrf=0.01, cos_lr=True)
    assert lfc(0) == pytest.approx(1.0)
    assert lfc(100) == pytest.approx(0.01)
    assert lfc(50) == pytest.approx((1.0 + 0.01) / 2, abs=1e-6)


def test_warmup_schedules():
    lf = lr_lambda(100, 0.01, False)
    lr_fn, bias_lr_fn, mom_fn = warmup_schedules(0.01, lf, nb=100, warmup_epochs=3.0,
                                                 warmup_bias_lr=0.1, warmup_momentum=0.8, momentum=0.937)
    # step 0: lr 0 (bias: 0.1), momentum 0.8
    assert float(lr_fn(jnp.asarray(0))) == pytest.approx(0.0)
    assert float(bias_lr_fn(jnp.asarray(0))) == pytest.approx(0.1)
    assert float(mom_fn(jnp.asarray(0))) == pytest.approx(0.8)
    # after warmup (300 steps): at scheduled value
    assert float(mom_fn(jnp.asarray(400))) == pytest.approx(0.937)
    assert float(lr_fn(jnp.asarray(400))) == pytest.approx(0.01 * lf(4.0), rel=1e-5)


def test_param_group_labels():
    params = {
        "layers_0": {"conv": {"kernel": jnp.zeros((3, 3, 3, 8))}, "bn": {"scale": jnp.zeros(8), "bias": jnp.zeros(8)}},
        "head": {"proj": {"kernel": jnp.zeros((8, 4)), "bias": jnp.zeros(4)}},
    }
    labels = jax.tree_util.tree_map_with_path(param_group_label, params)
    assert labels["layers_0"]["conv"]["kernel"] == "weight"
    assert labels["layers_0"]["bn"]["scale"] == "norm"
    # the reference checks 'bias' in fullname FIRST (trainer.py:1144-1152),
    # so BN biases join g2 and warm up from warmup_bias_lr
    assert labels["layers_0"]["bn"]["bias"] == "bias"
    assert labels["head"]["proj"]["bias"] == "bias"


def _rosenbrock_ish(params):
    # simple convex quadratic over a 2D matrix + bias
    w = params["w"]
    b = params["b"]
    return jnp.sum((w - 3.0) ** 2) + jnp.sum((b + 1.0) ** 2)


@pytest.mark.parametrize("name", ["SGD", "AdamW", "SOAP"])
def test_optimizers_converge_quadratic(name):
    params = {"w": jnp.ones((8, 4)), "b": jnp.zeros((4,))}
    tx = build_optimizer(
        params, name=name, lr0=0.05 if name != "SGD" else 0.2, momentum=0.9,
        weight_decay=0.0, nb=10, epochs=50, lrf=1.0, cos_lr=False,
        warmup_epochs=0.0, warmup_bias_lr=0.0, warmup_momentum=0.9,
    )
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(_rosenbrock_ish)(params)
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state, loss

    loss0 = float(_rosenbrock_ish(params))
    n_steps = 400 if name == "SOAP" else 150  # SOAP's (0.95, 0.95) betas ramp slowly
    for _ in range(n_steps):
        params, state, loss = step(params, state)
    assert float(loss) < loss0 * 1e-2, f"{name} failed to converge: {float(loss)} vs {loss0}"


def test_soap_preconditioner_state_updates():
    params = {"w": jnp.ones((6, 4))}
    tx = soap(0.01)
    state = tx.init(params)
    g = {"w": jnp.ones((6, 4)) * 0.5}
    # first step: no update (statistics only)
    upd, state = tx.update(g, state, params)
    assert float(jnp.abs(upd["w"]).sum()) == 0.0
    assert float(jnp.abs(state.leaves["w"].gg[0]).sum()) > 0  # GG accumulated
    # second step: real update
    upd, state = tx.update(g, state, params)
    assert float(jnp.abs(upd["w"]).sum()) > 0
    # eigenbases orthogonal (fp32 eigh on a near-rank-1 GG: loose tol)
    q = state.leaves["w"].q[0]
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(6), atol=1e-2)


def test_grad_accumulation_torch_semantics():
    """With accumulate=k the chain must (a) step only every k micro-batches,
    (b) apply the SUM of the k gradients (reference accumulates .backward()
    sums, trainer.py:798-817), and (c) index warmup schedules by the
    micro-batch counter ni, not the inner optimizer-step count."""
    k = 4
    params = {"w": jnp.ones((4, 4)), "head": {"bias": jnp.zeros(4)}}
    kw = dict(
        name="SGD", lr0=0.01, momentum=0.9, weight_decay=0.0, nb=8, epochs=10,
        lrf=0.01, cos_lr=False, warmup_epochs=0.0, warmup_bias_lr=0.1,
        warmup_momentum=0.8, clip_norm=1e9,
    )
    tx = build_optimizer(params, accumulate=k, **kw)
    state = tx.init(params)
    g = {"w": jnp.full((4, 4), 0.01), "head": {"bias": jnp.full((4,), 0.01)}}
    p = params
    for i in range(2 * k):
        upd, state = tx.update(g, state, p)
        if (i + 1) % k:
            assert float(jnp.abs(upd["w"]).max()) == 0.0  # mid-accumulation: no step
        p = optax.apply_updates(p, upd)

    # hand-rolled torch-SGD on summed grads. Schedules index by the
    # micro-batch counter ni AT WHICH THE UPDATE FIRES: torch steps when
    # ni - last_opt_step >= accumulate (trainer.py:813), i.e. at
    # ni = s*k + (k-1) with no warmup ramp — the lr/momentum applied are the
    # ones interpolated at that firing batch.
    from experiment_yolo_tpu.optim.builders import lr_lambda, warmup_schedules

    lf = lr_lambda(kw["epochs"], kw["lrf"], kw["cos_lr"])
    lr_fn, bias_lr_fn, mom_fn = warmup_schedules(
        kw["lr0"], lf, kw["nb"], kw["warmup_epochs"], kw["warmup_bias_lr"],
        kw["warmup_momentum"], 0.9)
    ref = {"w": np.ones((4, 4)), "b": np.zeros(4)}
    buf = {"w": np.zeros((4, 4)), "b": np.zeros(4)}
    for s in range(2):
        ni = s * k + (k - 1)
        mu, lw, lb = float(mom_fn(ni)), float(lr_fn(ni)), float(bias_lr_fn(ni))
        for key, lr in (("w", lw), ("b", lb)):
            G = np.full_like(ref[key], 0.01) * k  # summed over k micro-batches
            buf[key] = mu * buf[key] + G
            ref[key] -= lr * (G + mu * buf[key])  # nesterov
    np.testing.assert_allclose(np.asarray(p["w"]), ref["w"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p["head"]["bias"]), ref["b"], rtol=1e-5)


def test_torch_step_plan_matches_reference_loop():
    """_torch_step_plan must reproduce the reference's exact firing pattern
    (trainer.py:783-815): accumulate ramps 1 -> k during the nw-batch warmup
    (so the optimizer steps nearly every batch early), k batches thereafter,
    and every batch lands in exactly one update."""
    from experiment_yolo_tpu.optim.builders import _torch_step_plan

    ks, nis = _torch_step_plan(nb=6, epochs=60, warmup_epochs=3.0, k_full=4)
    assert nis[0] == 0 and ks[0] == 1  # steps on the very first batch
    # early phase: consecutive batches
    assert nis[:5].tolist() == [0, 1, 2, 3, 4]
    # after warmup (nw = 100): every 4th batch
    import numpy as np

    tail = np.diff(nis[-10:])
    assert (tail == 4).all()
    # partition: accumulated batch counts cover every batch exactly once
    assert ks.sum() == nis[-1] + 1
    # no-warmup plan: plain every-k stepping, firing at the k-th batch
    ks0, nis0 = _torch_step_plan(nb=8, epochs=10, warmup_epochs=0.0, k_full=4)
    assert nis0[:3].tolist() == [3, 7, 11] and set(ks0.tolist()) == {4}
