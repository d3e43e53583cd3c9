"""Pallas kernel vs pure-jnp reference equivalence tests.

Pattern mirrors the reference repo's CUDA-extension tests
(ops_dcnv3/test.py — kernel vs pure-framework implementation on random
tensors, allclose). Kernels run in interpreter mode on the CPU test
backend; TPU execution is covered by the verify drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.pallas.ldconv_kernel import (
    bilinear_gather_reference,
    bilinear_gather_single,
)
from experiment_yolo_tpu.ops.pallas.nms_kernel import nms_suppress, nms_suppress_reference


class TestNMSKernel:
    def _random_candidates(self, k, seed=0):
        rng = np.random.RandomState(seed)
        centers = rng.uniform(0, 400, (k, 2))
        wh = rng.uniform(10, 80, (k, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
        # score-sorted by construction (descending synthetic scores)
        valid = rng.rand(k) > 0.2
        return jnp.asarray(boxes), jnp.asarray(valid)

    @pytest.mark.parametrize("k,seed", [(64, 0), (128, 1), (256, 2)])
    def test_matches_reference(self, k, seed):
        boxes, valid = self._random_candidates(k, seed)
        ref = nms_suppress_reference(boxes, valid, 0.5)
        got = nms_suppress(boxes, valid, 0.5, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_identical_boxes_keep_first(self):
        boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 10.0, 10.0]]), (8, 1))
        valid = jnp.ones(8, bool)
        keep = nms_suppress(boxes, valid, 0.5, interpret=True)
        assert bool(keep[0]) and int(keep.sum()) == 1

    def test_invalid_never_kept_nor_suppressing(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [2, 2, 12, 12]], jnp.float32
        )
        valid = jnp.asarray([False, True, True])
        keep = nms_suppress(boxes, valid, 0.5, interpret=True)
        ref = nms_suppress_reference(boxes, valid, 0.5)
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(ref))
        assert not bool(keep[0])
        assert bool(keep[1])  # box0 invalid, must not suppress box1


class TestLDConvGatherKernel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_reference(self, seed):
        rng = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(rng)
        x = jax.random.normal(k1, (12, 10, 8))
        # positions spread across and beyond borders (clamping path)
        p = jax.random.uniform(k2, (40, 2), minval=-2.0, maxval=14.0)
        ref = bilinear_gather_reference(x, p)
        got = bilinear_gather_single(x, p, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_integer_positions_exact(self):
        x = jnp.arange(5 * 4 * 2, dtype=jnp.float32).reshape(5, 4, 2)
        p = jnp.asarray([[2.0, 3.0], [0.0, 0.0], [4.0, 3.0]])
        got = bilinear_gather_single(x, p, interpret=True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(x[2, 3]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(x[0, 0]))
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(x[4, 3]))


def test_ldconv_gather_custom_vjp_grads():
    """The windowed-gather custom VJP's gradients (hand-written scatter dx +
    analytic dp) must match autodiff of a naive take-along-axis reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from experiment_yolo_tpu.nn.modules import ldconv_bilinear_gather

    def naive(x, p):
        b, hx, wx, c = x.shape
        pr = jnp.clip(p[..., 0], 0.0, hx - 1)
        pc = jnp.clip(p[..., 1], 0.0, wx - 1)
        r0 = jnp.clip(jnp.floor(pr), 0, hx - 1)
        c0 = jnp.clip(jnp.floor(pc), 0, wx - 1)
        r1 = jnp.clip(r0 + 1, 0, hx - 1)
        c1 = jnp.clip(c0 + 1, 0, wx - 1)
        wr1, wc1 = pr - r0, pc - c0
        wr0, wc0 = 1.0 - wr1, 1.0 - wc1
        xf = x.reshape(b, hx * wx, c)

        def gat(rr, cc):
            fi = (rr * wx + cc).astype(jnp.int32).reshape(b, -1)
            return jnp.take_along_axis(xf, fi[..., None], axis=1).reshape(*rr.shape, c)

        return ((wr0 * wc0)[..., None] * gat(r0, c0) + (wr0 * wc1)[..., None] * gat(r0, c1)
                + (wr1 * wc0)[..., None] * gat(r1, c0) + (wr1 * wc1)[..., None] * gat(r1, c1))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 11, 5).astype(np.float32))
    # positions include interior, borders, and out-of-range (clamped) points
    # borders/out-of-range but NOT exactly on a rail (at exact rails autodiff
    # of clip tie-splits the gradient 0.5x; ours passes it whole — both are
    # valid subgradients on a measure-zero set)
    extra = (np.array([[-1.5, 3.2], [9.7, 11.4], [0.25, 0.25]], np.float32)
             .reshape(1, 1, 1, 3, 2) * np.ones((2, 1, 4, 3, 2), np.float32))
    p = jnp.asarray(np.concatenate([rng.rand(2, 3, 4, 3, 2) * 8.0, extra],
                                   axis=1).astype(np.float32))
    t = jnp.asarray(rng.randn(*ldconv_bilinear_gather(x, p).shape).astype(np.float32))

    def loss_new(x, p):
        return (ldconv_bilinear_gather(x, p) * t).sum()

    def loss_ref(x, p):
        return (naive(x, p) * t).sum()

    np.testing.assert_allclose(loss_new(x, p), loss_ref(x, p), rtol=1e-5)
    gx_n, gp_n = jax.grad(loss_new, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(gx_n, gx_r, atol=1e-4, rtol=1e-4)
    # dp: the naive clip-chain and our in-range mask agree except exactly AT
    # integer rail positions (measure-zero; clamped points give 0 both ways)
    np.testing.assert_allclose(gp_n, gp_r, atol=1e-3, rtol=1e-3)
