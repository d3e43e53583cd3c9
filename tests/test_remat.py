"""Per-layer rematerialization (GraphModel remat=True): gradient and
batch-stats equality vs the non-remat path, and the residual-size cut that
justifies it (remat frees block-internal activations so batch 128 fits HBM;
the reference's analogue is torch.utils.checkpoint, unused upstream —
our TPU train path needs it because XLA's batch-minor conv-grad layouts
only fill all 128 lanes at batch >= 128)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.tasks import DetectionModel


@pytest.fixture(scope="module")
def tiny():
    m = DetectionModel("tests/assets/tiny.yaml")
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    return m, v, x


def _loss_fn(m, v, x, remat):
    def loss(params):
        out, upd = m.module.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, True,
            mutable=["batch_stats"], remat=remat,
        )
        return sum(f.astype(jnp.float32).sum() for f in out), upd["batch_stats"]

    return loss


def test_remat_grads_and_stats_match(tiny):
    m, v, x = tiny
    (l0, s0), g0 = jax.value_and_grad(_loss_fn(m, v, x, False), has_aux=True)(v["params"])
    (l1, s1), g1 = jax.value_and_grad(_loss_fn(m, v, x, True), has_aux=True)(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5), g0, g1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), s0, s1)


def test_remat_shrinks_residuals(tiny):
    """tiny.yaml has few block internals (and the custom-vjp BatchNorm already
    dropped most residuals), so only assert a strict decrease here; the big
    cut (4.4 GB -> ~2 GB at ASF-P2P2 b32) is documented in docs/KERNELS.md."""
    import io
    import re
    from contextlib import redirect_stdout

    from jax.ad_checkpoint import print_saved_residuals

    m, v, x = tiny
    sizes = {}
    for remat in (False, True):
        buf = io.StringIO()
        with redirect_stdout(buf):
            print_saved_residuals(lambda p: _loss_fn(m, v, x, remat)(p)[0], v["params"])
        tot = 0
        for ln in buf.getvalue().splitlines():
            mm = re.match(r"\s*(f32|bf16|f16)\[([\d,]*)\]", ln)
            if mm:
                n = 1
                for d in mm.group(2).split(","):
                    if d:
                        n *= int(d)
                tot += n * (4 if mm.group(1) == "f32" else 2)
        sizes[remat] = tot
    assert sizes[True] < sizes[False], sizes


def test_selective_remat_int_threshold(tiny):
    """remat=<int> only remats layers with input H*W >= threshold; gradients
    must match the non-remat path regardless of the partition."""
    m, v, x = tiny
    (l0, _), g0 = jax.value_and_grad(_loss_fn(m, v, x, False), has_aux=True)(v["params"])
    (l1, _), g1 = jax.value_and_grad(_loss_fn(m, v, x, 16 * 16), has_aux=True)(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5), g0, g1)
