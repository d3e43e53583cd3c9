"""RT-DETR model tests: param parity, forward/predict shapes, components."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn import transformer as T
from experiment_yolo_tpu.nn.tasks import DetectionModel


def test_rtdetr_param_count_matches_reference():
    m = DetectionModel("rtdetr.yaml")
    # torch reference RTDETRDetectionModel('rtdetr.yaml'): 42,773,062
    assert m.num_params_static() == 42773062
    assert m.head_type == "RTDETRDecoder"


def test_aifi_shapes_and_pos_embedding():
    aifi = T.AIFI(cm=128, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 10, 64))
    v = aifi.init(jax.random.PRNGKey(1), x)
    y = aifi.apply(v, x)
    assert y.shape == x.shape
    pos = T.sincos_2d(10, 8, 64)
    assert pos.shape == (1, 80, 64)
    # embedding rows differ across positions
    assert not np.allclose(np.asarray(pos[0, 0]), np.asarray(pos[0, 1]))


def test_bilinear_sample_zeros_padding():
    v = jnp.ones((1, 4, 4, 2))
    # center sample = 1; far outside = 0; halfway off the edge interpolates
    loc = jnp.asarray([[[0.5, 0.5], [2.0, 2.0], [0.0, 0.5]]])
    out = T._bilinear_sample_zeros(v, loc)
    assert out[0, 0, 0] == pytest.approx(1.0)
    assert out[0, 1, 0] == pytest.approx(0.0)
    assert out[0, 2, 0] == pytest.approx(0.5)  # boundary: half weight outside


def test_msdeform_attn_runs():
    attn = T.MSDeformAttn(d_model=64, n_levels=2, n_heads=4, n_points=2)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 8 * 8 + 4 * 4, 64))
    query = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 64))
    refer = jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.2]), (2, 5, 1))
    v = attn.init(jax.random.PRNGKey(2), query, refer, feats, ((8, 8), (4, 4)))
    out = attn.apply(v, query, refer, feats, ((8, 8), (4, 4)))
    assert out.shape == (2, 5, 64)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_rtdetr_forward_predict():
    m = DetectionModel("rtdetr.yaml")
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    out = m.apply(v, x)
    assert out.shape == (1, 16, 4 + 6) or out.shape[2] == 10  # nq clamped at tiny size
    boxes, scores = m.predict(v, x)
    assert boxes.shape[:2] == scores.shape[:2]
    assert scores.shape[-1] == 6
    assert bool(jnp.isfinite(boxes).all())
    # boxes scaled to pixels, cxcywh in [0, 128]
    assert float(boxes.max()) <= 128.0 + 1e-3


def test_rtdetr_denoising_groups():
    """Contrastive denoising (reference models/utils/ops.py:153): static
    2*num_group*M dn queries join the decoder behind a group-block attention
    mask; the dn loss uses the known matching and flows gradients."""
    import numpy as np

    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils.detr_loss import rtdetr_loss

    m = DetectionModel("rtdetr.yaml", nc=4)
    v = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 128, 3))
    gt = {"bboxes": jnp.full((2, 6, 4), 0.4), "cls": jnp.zeros((2, 6), jnp.int32),
          "mask": jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0]], bool)}
    out, _ = m.apply(v, x, True, mutable=["batch_stats"], dn_gt=gt, dn_rng=jax.random.PRNGKey(7))
    ng = out["dn_num_group"]
    assert out["dn_bboxes"].shape[2] == 2 * ng * 6
    assert out["dec_bboxes"].shape[2] == 300  # matching queries unchanged

    out32 = jax.tree.map(lambda t: t.astype(jnp.float32) if hasattr(t, "astype") else t, out)
    total, comps = rtdetr_loss(out32, gt, 4)
    assert np.isfinite(float(total))
    assert {"dn_cls", "dn_bbox", "dn_giou"} <= set(comps)
    # without dn inputs the plain train path still works
    out2, _ = m.apply(v, x, True, mutable=["batch_stats"])
    assert "dn_bboxes" not in out2
