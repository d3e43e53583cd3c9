"""DETR loss tests: Hungarian matching semantics, loss discriminativity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.utils.detr_loss import _layer_loss, greedy_match, hungarian_match, rtdetr_loss


def _scene(q=8, m=4, nc=3):
    """2 gts; queries 0 and 3 sit exactly on them with confident scores."""
    gt_b = np.zeros((1, m, 4), np.float32)
    gt_c = np.zeros((1, m), np.int32)
    mask = np.zeros((1, m), bool)
    gt_b[0, 0] = [0.3, 0.3, 0.2, 0.2]
    gt_b[0, 1] = [0.7, 0.7, 0.1, 0.1]
    gt_c[0, 0], gt_c[0, 1] = 1, 2
    mask[0, :2] = True
    pb = np.tile(np.asarray([0.5, 0.5, 0.05, 0.05], np.float32), (1, q, 1))
    ps = np.full((1, q, nc), -4.0, np.float32)
    pb[0, 0] = gt_b[0, 0]
    ps[0, 0, 1] = 4.0
    pb[0, 3] = gt_b[0, 1]
    ps[0, 3, 2] = 4.0
    return jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(gt_b), jnp.asarray(gt_c), jnp.asarray(mask)


def test_hungarian_matches_obvious_pairs():
    pb, ps, gt_b, gt_c, mask = _scene()
    matched = hungarian_match(pb, ps, gt_b, gt_c, mask)
    assert int(matched[0, 0]) == 0  # gt0 -> query0
    assert int(matched[0, 1]) == 3  # gt1 -> query3
    assert (np.asarray(matched[0, 2:]) == -1).all()  # padded gts unmatched


def test_hungarian_unique_assignment():
    # two gts on the same spot: two different queries must be assigned
    q, m, nc = 6, 4, 2
    gt_b = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (1, m, 1))
    gt_c = np.zeros((1, m), np.int32)
    mask = np.zeros((1, m), bool)
    mask[0, :2] = True
    pb = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (1, q, 1))
    ps = np.zeros((1, q, nc), np.float32)
    matched = hungarian_match(jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(gt_b), jnp.asarray(gt_c), jnp.asarray(mask))
    a, b = int(matched[0, 0]), int(matched[0, 1])
    assert a != b and a >= 0 and b >= 0


def test_greedy_matches_hungarian_on_separated_scene():
    pb, ps, gt_b, gt_c, mask = _scene()
    h = hungarian_match(pb, ps, gt_b, gt_c, mask)
    g = greedy_match(pb, ps, gt_b, gt_c, mask)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(g))


def test_greedy_unique_and_masked():
    q, m, nc = 6, 4, 2
    rng = np.random.RandomState(0)
    pb = jnp.asarray(rng.uniform(0.2, 0.8, (2, q, 4)).astype(np.float32))
    ps = jnp.asarray(rng.normal(0, 1, (2, q, nc)).astype(np.float32))
    gt_b = jnp.asarray(rng.uniform(0.2, 0.8, (2, m, 4)).astype(np.float32))
    gt_c = jnp.zeros((2, m), jnp.int32)
    mask = jnp.asarray(np.array([[True, True, True, False], [True, False, False, False]]))
    out = np.asarray(greedy_match(pb, ps, gt_b, gt_c, mask))
    for b in range(2):
        got = out[b][np.asarray(mask[b])]
        assert (got >= 0).all()
        assert len(set(got.tolist())) == len(got)  # unique queries
        assert (out[b][~np.asarray(mask[b])] == -1).all()


def test_layer_loss_discriminates():
    pb, ps, gt_b, gt_c, mask = _scene()
    matched = hungarian_match(pb, ps, gt_b, gt_c, mask)
    lc_good, lb_good, lg_good = _layer_loss(pb, ps, gt_b, gt_c, mask, matched, nc=3)
    # perturb boxes away from gts
    pb_bad = pb + 0.2
    lc_bad, lb_bad, lg_bad = _layer_loss(pb_bad, ps, gt_b, gt_c, mask, matched, nc=3)
    assert float(lb_good) < float(lb_bad)
    assert float(lg_good) < float(lg_bad)
    assert all(np.isfinite([float(x) for x in (lc_good, lb_good, lg_good)]))


def test_rtdetr_loss_end_to_end_gradients():
    q, m, nc, L = 8, 4, 3, 2
    rng = jax.random.PRNGKey(0)
    dec_b = jax.nn.sigmoid(jax.random.normal(rng, (L, 1, q, 4)))
    dec_s = jax.random.normal(jax.random.PRNGKey(1), (L, 1, q, nc))
    _, _, gt_b, gt_c, mask = _scene(q=q, m=m, nc=nc)
    batch = {"bboxes": gt_b, "cls": gt_c, "mask": mask}

    def f(dec_b, dec_s):
        out = {
            "dec_bboxes": dec_b,
            "dec_scores": dec_s,
            "enc_bboxes": dec_b[0],
            "enc_scores": dec_s[0],
        }
        total, comps = rtdetr_loss(out, batch, nc)
        return total

    total = f(dec_b, dec_s)
    assert bool(jnp.isfinite(total))
    g = jax.grad(f, argnums=(0, 1))(dec_b, dec_s)
    assert all(bool(jnp.isfinite(x).all()) for x in g)
    assert float(jnp.abs(g[0]).sum()) > 0
