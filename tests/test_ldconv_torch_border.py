"""LDConv vs the torch reference with LARGE offsets — the border-quirk check.

Round-4 postmortem: unit parity only ever exercised near-zero offsets (the
reference zero-inits ``p_conv.weight``), so the out-of-border weighting was
never cross-checked and trained-weight forwards diverged catastrophically
(PARITY.md round 4: 0/300 box agreement on LD-P2). The reference clamps
corner indices and positions independently (conv.py:379-393), which
amplifies out-of-border samples by 2 per OOB axis (4 at corners) — fires at
``p == size-1`` exactly. These tests drive offsets far outside the image on
purpose and compare the full module (both sampling paths) and its gradients
against the torch reference.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.modules import LDConv

REF = Path("/root/reference")
STUB = Path(__file__).resolve().parents[1] / "tools" / "refstub"

pytestmark = pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")


@pytest.fixture(scope="module")
def torch_ldconv():
    sys.path.insert(0, str(STUB))
    sys.path.insert(0, str(REF))
    import torch  # noqa: F401

    from ultralytics.nn.modules.conv import LDConv as TorchLDConv

    return TorchLDConv


def _build_pair(
    torch_ldconv, inc, outc, num_param, stride, offset_scale, seed=0, max_off=None
):
    """Torch LDConv with RANDOM offset-conv weights + our LDConv sharing them.

    ``max_off`` deterministically rescales p_conv so every offset over the
    probe input stays under it — used by dense-path tests, which are only
    defined for offsets inside the static hat window [-R, R+1).
    """
    import torch

    torch.manual_seed(seed)
    tm = torch_ldconv(inc, outc, num_param, stride=stride)
    # in a BUILT reference model, initialize_weights (torch_utils.py:348-350)
    # resets every BatchNorm2d to eps=1e-3/momentum=0.03 — replicate that
    # in-model reality on the raw module (our LDConv uses 1e-3 to match)
    tm.conv[1].eps = 1e-3
    tm.conv[1].momentum = 0.03
    with torch.no_grad():
        # large offsets: the whole point — stock zero-init never leaves ±0.1
        tm.p_conv.weight.normal_(0, 0.5 * offset_scale)
        tm.p_conv.bias.normal_(0, 2.0 * offset_scale)
        if max_off is not None:
            probe = torch.from_numpy(
                np.random.RandomState(1).randn(2, inc, 32, 32).astype(np.float32))
            peak = tm.p_conv(probe).abs().max().item()
            if peak > max_off:
                tm.p_conv.weight.mul_(max_off / peak)
                tm.p_conv.bias.mul_(max_off / peak)
    tm.eval()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    n, o, i = num_param, outc, inc
    params = {
        "p_conv": {
            "kernel": np.transpose(sd["p_conv.weight"], (2, 3, 1, 0)),
            "bias": sd["p_conv.bias"],
        },
        # (N,1)-kernel conv -> Dense: dense[n*C+i, o] = W[o, i, n, 0]
        "proj": {
            "kernel": np.transpose(sd["conv.0.weight"][..., 0], (2, 1, 0)).reshape(n * i, o)
        },
        "bn": {"scale": sd["conv.1.weight"], "bias": sd["conv.1.bias"]},
    }
    stats = {
        "bn": {"mean": sd["conv.1.running_mean"], "var": sd["conv.1.running_var"]}
    }
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    return tm, variables


@pytest.mark.parametrize("sampling", ["dense", "gather", "auto"])
@pytest.mark.parametrize(
    "num_param,stride,offset_scale",
    [(3, 1, 1.0), (5, 1, 3.0), (4, 2, 2.0), (3, 2, 6.0), (6, 1, 10.0)],
)
def test_forward_matches_torch_large_offsets(
    torch_ldconv, sampling, num_param, stride, offset_scale
):
    import torch

    inc, outc, H, W = 3, 4, 17, 13
    # dense-path exactness is only defined inside the hat window [-R, R+1);
    # gather/auto must handle arbitrarily large offsets (auto falls back)
    max_off = 1.9 if sampling == "dense" else None
    tm, variables = _build_pair(
        torch_ldconv, inc, outc, num_param, stride, offset_scale, max_off=max_off)
    rng = np.random.RandomState(1)
    x = rng.randn(2, inc, H, W).astype(np.float32)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()  # (B, outc, h, w)

    ours = LDConv(c2=outc, num_param=num_param, stride=stride, sampling=sampling)
    j_out = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    j_out = np.transpose(np.asarray(j_out), (0, 3, 1, 2))
    np.testing.assert_allclose(j_out, t_out, atol=3e-5, rtol=1e-4)


def test_edge_doubling_fires_at_zero_offset(torch_ldconv):
    """Even at zero offsets the base grid (p_n spans 0..+2) leaves the image
    at bottom/right edges — the quirk is active from step 0 of training."""
    import torch

    inc, outc, num_param = 2, 3, 5
    tm, variables = _build_pair(torch_ldconv, inc, outc, num_param, 1, 0.0)
    with torch.no_grad():
        tm.p_conv.weight.zero_()
        tm.p_conv.bias.zero_()
    variables["params"]["p_conv"]["kernel"] = jnp.zeros_like(
        variables["params"]["p_conv"]["kernel"])
    variables["params"]["p_conv"]["bias"] = jnp.zeros_like(
        variables["params"]["p_conv"]["bias"])

    rng = np.random.RandomState(2)
    x = rng.randn(1, inc, 8, 9).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x)).numpy()

    for border, should_match in [("torch", True), ("unity", False)]:
        ours = LDConv(c2=outc, num_param=num_param, border=border)
        j_out = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        j_out = np.transpose(np.asarray(j_out), (0, 3, 1, 2))
        err = np.abs(j_out - t_out).max()
        if should_match:
            assert err < 3e-5, f"border='torch' diverges: {err}"
        else:
            assert err > 1e-3, "unity mode unexpectedly reproduces the quirk"


@pytest.mark.parametrize("sampling", ["dense", "gather"])
def test_grads_match_torch_large_offsets(torch_ldconv, sampling):
    """Offset-conv and input gradients vs torch autograd, with many OOB
    samples (zero offset-grad outside the border, doubled x-grads at edges)."""
    import torch

    inc, outc, num_param, stride = 3, 4, 4, 1
    max_off = 1.9 if sampling == "dense" else None
    tm, variables = _build_pair(
        torch_ldconv, inc, outc, num_param, stride, 2.0, max_off=max_off)
    rng = np.random.RandomState(3)
    x = rng.randn(2, inc, 11, 10).astype(np.float32)
    # a fixed cotangent so both frameworks differentiate the same scalar
    with torch.no_grad():
        ty_shape = tm(torch.from_numpy(x)).shape
    t = rng.randn(*ty_shape).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    (tm(xt) * torch.from_numpy(t)).sum().backward()
    t_dx = xt.grad.numpy()
    t_dw = tm.p_conv.weight.grad.numpy()
    t_db = tm.p_conv.bias.grad.numpy()

    ours = LDConv(c2=outc, num_param=num_param, stride=stride, sampling=sampling)
    tn = jnp.asarray(np.transpose(t, (0, 2, 3, 1)))

    def loss(params, xin):
        y = ours.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, xin)
        return (y * tn).sum()

    (dparams, dx) = jax.grad(loss, argnums=(0, 1))(
        variables["params"], jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    j_dx = np.transpose(np.asarray(dx), (0, 3, 1, 2))
    j_dw = np.transpose(np.asarray(dparams["p_conv"]["kernel"]), (3, 2, 0, 1))
    j_db = np.asarray(dparams["p_conv"]["bias"])

    np.testing.assert_allclose(j_dx, t_dx, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(j_dw, t_dw, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(j_db, t_db, atol=1e-3, rtol=1e-3)
