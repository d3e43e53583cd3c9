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
