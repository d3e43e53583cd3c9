"""Segment / Pose / OBB head shape + decode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.heads_extra import (
    OBB,
    Pose,
    Proto,
    Segment,
    assemble_masks,
    decode_kpts,
    decode_obb_angle,
)

CH = (32, 64)
XS = [
    jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32)),
    jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64)),
]


def test_segment_head_shapes():
    head = Segment(nc=3, nm=8, npr=32, ch=CH)
    v = head.init(jax.random.PRNGKey(2), XS)
    det, coeffs, protos = head.apply(v, XS)
    assert [d.shape[-1] for d in det] == [64 + 3, 64 + 3]
    assert [c.shape for c in coeffs] == [(2, 16, 16, 8), (2, 8, 8, 8)]
    assert protos.shape == (2, 32, 32, 8)
    # mask assembly
    k = 5
    cf = jax.random.normal(jax.random.PRNGKey(3), (2, k, 8))
    masks = assemble_masks(cf, protos)
    assert masks.shape == (2, k, 32, 32)
    assert float(masks.min()) >= 0 and float(masks.max()) <= 1


def test_pose_head_and_decode():
    head = Pose(nc=1, kpt_shape=(17, 3), ch=CH)
    v = head.init(jax.random.PRNGKey(2), XS)
    det, kpts = head.apply(v, XS)
    assert [k.shape[-1] for k in kpts] == [51, 51]
    decoded = decode_kpts(kpts, strides=[8, 16], kpt_shape=(17, 3))
    assert decoded.shape == (2, 16 * 16 + 8 * 8, 17, 3)
    vis = np.asarray(decoded[..., 2])
    assert (vis >= 0).all() and (vis <= 1).all()


def test_obb_head_angle_range():
    head = OBB(nc=3, ne=1, ch=CH)
    v = head.init(jax.random.PRNGKey(2), XS)
    det, angles = head.apply(v, XS)
    decoded = np.asarray(decode_obb_angle(angles))
    assert decoded.shape == (2, 16 * 16 + 8 * 8, 1)
    assert (decoded > -np.pi / 4 - 1e-6).all() and (decoded < 3 * np.pi / 4 + 1e-6).all()
