"""DCNv3 core vs the reference's pure-torch fallback (the repo's own
ops_dcnv3/test.py pattern: core vs dcnv3_core_pytorch on random tensors)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.dcnv3 import DCNv3, dcnv3_core

REF = Path("/root/reference")
STUB = Path(__file__).resolve().parents[1] / "tools" / "refstub"


def test_uniform_mask_zero_offset_is_tap_average():
    """With zero offsets and a uniform mask, the core averages the kernel
    taps — equals a 3x3 average pooling (interior pixels)."""
    b, h, w, g, gc, k = 1, 8, 8, 2, 4, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, g * gc))
    offset = jnp.zeros((b, h, w, g * k * k * 2))
    mask = jnp.full((b, h, w, g * k * k), 1.0 / (k * k))
    out = dcnv3_core(x, offset, mask, kernel=k, group=g)
    # interior check against explicit 3x3 mean
    xp = np.asarray(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
    i, j = 4, 5
    want = xp[0, i : i + 3, j : j + 3].mean(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(out[0, i, j]), want, atol=1e-4)


@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_matches_reference_core():
    sys.path.insert(0, str(STUB))
    sys.path.insert(0, str(REF))
    import torch

    from ultralytics.nn.extra_modules.ops_dcnv3.functions.dcnv3_func import dcnv3_core_pytorch

    rng = np.random.RandomState(0)
    b, h, w, g, gc, k = 2, 10, 12, 2, 4, 3
    x = rng.randn(b, h, w, g * gc).astype(np.float32)
    offset = (rng.randn(b, h, w, g * k * k * 2) * 2).astype(np.float32)
    raw_mask = rng.randn(b, h, w, g * k * k).astype(np.float32)
    sm = torch.softmax(torch.from_numpy(raw_mask).view(b, h, w, g, k * k), -1).view(b, h, w, -1)

    ref = dcnv3_core_pytorch(
        torch.from_numpy(x), torch.from_numpy(offset), sm,
        k, k, 1, 1, 1, 1, 1, 1, g, gc, 1.0, 0,
    ).numpy()
    got = dcnv3_core(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(sm.numpy()), kernel=k, group=g)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_dcnv3_module_shapes():
    m = DCNv3(channels=16, group=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 16)
    assert bool(jnp.isfinite(out).all())
