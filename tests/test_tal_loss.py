"""TAL assigner and detection-loss behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.anchors import make_anchors
from experiment_yolo_tpu.utils import tal
from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss


def _simple_scene(nc=4, m=8):
    """One 8x8 stride-8 level; one gt box covering a 2x2 anchor patch."""
    anchors, strides = make_anchors([(8, 8)], [8])
    anc_pix = anchors * strides  # (64, 2)
    gt_bboxes = np.zeros((1, m, 4), np.float32)
    gt_labels = np.zeros((1, m), np.int32)
    mask = np.zeros((1, m), bool)
    gt_bboxes[0, 0] = [8.0, 8.0, 28.0, 28.0]  # covers anchors at (12,12),(20,20)...
    gt_labels[0, 0] = 2
    mask[0, 0] = True
    return anc_pix, jnp.asarray(gt_bboxes), jnp.asarray(gt_labels), jnp.asarray(mask)


class TestTAL:
    def test_assigns_inside_anchors(self):
        anc, gt_b, gt_l, mask = _simple_scene()
        a = anc.shape[0]
        nc = 4
        # predictions: boxes exactly on gt for every anchor; confident class 2
        pd_scores = jnp.full((1, a, nc), 0.1).at[..., 2].set(0.9)
        pd_bboxes = jnp.broadcast_to(gt_b[:, 0][:, None], (1, a, 4))
        res = tal.assign(pd_scores, pd_bboxes, anc, gt_l, gt_b, mask, topk=10, num_classes=nc)
        fg = np.asarray(res.fg_mask[0])
        inside = np.asarray((anc[:, 0] > 8) & (anc[:, 0] < 28) & (anc[:, 1] > 8) & (anc[:, 1] < 28))
        # fg anchors must be a subset of inside anchors, and non-empty
        assert fg.sum() > 0
        assert not np.any(fg & ~inside)
        assert np.all(np.asarray(res.target_labels[0])[fg] == 2)
        got = np.asarray(res.target_bboxes[0])[fg]
        np.testing.assert_allclose(got, np.tile([8, 8, 28, 28], (len(got), 1)))
        # target scores: positive only on fg anchors at class 2
        ts = np.asarray(res.target_scores[0])
        assert (ts[fg, 2] > 0).all()
        assert ts[~fg].sum() == 0

    def test_padding_rows_ignored(self):
        anc, gt_b, gt_l, mask = _simple_scene()
        a = anc.shape[0]
        pd_scores = jnp.full((1, a, 4), 0.5)
        pd_bboxes = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 64.0, 64.0]), (1, a, 4))
        # no valid gt at all -> no fg
        res = tal.assign(pd_scores, pd_bboxes, anc, gt_l, gt_b, jnp.zeros_like(mask), topk=10, num_classes=4)
        assert int(res.fg_mask.sum()) == 0
        assert float(res.target_scores.sum()) == 0.0

    def test_multi_gt_anchor_resolves_to_best_iou(self):
        anchors, strides = make_anchors([(4, 4)], [8])
        anc = anchors * strides
        m = 4
        gt_b = np.zeros((1, m, 4), np.float32)
        gt_l = np.zeros((1, m), np.int32)
        mask = np.zeros((1, m), bool)
        gt_b[0, 0] = [0, 0, 32, 32]  # big box
        gt_b[0, 1] = [8, 8, 24, 24]  # small box inside it
        gt_l[0, 0], gt_l[0, 1] = 1, 3
        mask[0, :2] = True
        a = anc.shape[0]
        # predicted boxes match the SMALL box everywhere -> overlaps favor gt 1
        pd_bboxes = jnp.broadcast_to(jnp.asarray([8.0, 8.0, 24.0, 24.0]), (1, a, 4))
        pd_scores = jnp.full((1, a, 4), 0.5)
        res = tal.assign(pd_scores, pd_bboxes, anc, jnp.asarray(gt_l), jnp.asarray(gt_b), jnp.asarray(mask), topk=10, num_classes=4)
        fg = np.asarray(res.fg_mask[0])
        labels = np.asarray(res.target_labels[0])
        # anchors inside both boxes must resolve to the small box (higher IoU)
        both = np.asarray((anc[:, 0] > 8) & (anc[:, 0] < 24) & (anc[:, 1] > 8) & (anc[:, 1] < 24))
        assert np.all(labels[fg & both] == 3)


def _feats_for(gt_xyxy, label, nc=4, h=8, stride=8, reg_max=16, sharp=True):
    """Construct a single-level head map whose decode equals gt exactly."""
    anchors, _ = make_anchors([(h, h)], [stride])
    a = anchors.shape[0]
    # distances in grid units: anchor - x1y1, x2y2 - anchor
    g = jnp.asarray(gt_xyxy) / stride
    lt = anchors - g[:2]
    rb = g[2:] - anchors
    dist = jnp.concatenate([lt, rb], -1)  # (A, 4), may be negative outside
    dist = jnp.clip(dist, 0, reg_max - 1.01)
    # build DFL logits: put high logit mass on floor/ceil bins
    tl = jnp.floor(dist).astype(jnp.int32)
    wl = (tl + 1).astype(jnp.float32) - dist
    logits = jnp.full((a, 4, reg_max), -10.0)
    oh_l = jax.nn.one_hot(tl, reg_max) * (10.0 + jnp.log(wl + 1e-9)[..., None])
    oh_r = jax.nn.one_hot(jnp.clip(tl + 1, 0, reg_max - 1), reg_max) * (10.0 + jnp.log(1 - wl + 1e-9)[..., None])
    logits = logits + oh_l + oh_r
    cls = jnp.full((a, nc), -8.0).at[:, label].set(8.0)
    flat = jnp.concatenate([logits.reshape(a, -1), cls], -1)
    return [flat.reshape(1, h, h, 4 * reg_max + nc)]


class TestDetectionLoss:
    def _batch(self, m=8, imgsz=64.0):
        bb = np.zeros((1, m, 4), np.float32)
        cl = np.zeros((1, m), np.int32)
        mask = np.zeros((1, m), bool)
        # gt in normalized xywh: center (18,18)/64, size 20/64
        bb[0, 0] = [18 / imgsz, 18 / imgsz, 20 / imgsz, 20 / imgsz]
        cl[0, 0] = 2
        mask[0, 0] = True
        return {"bboxes": jnp.asarray(bb), "cls": jnp.asarray(cl), "mask": jnp.asarray(mask)}

    def test_perfect_prediction_small_loss(self):
        cfg = LossConfig(nc=4)
        batch = self._batch()
        feats_good = _feats_for([8, 8, 28, 28], 2, nc=4)
        total_good, comps_good, _ = detection_loss(feats_good, batch, [8], cfg)
        feats_bad = _feats_for([40, 40, 60, 60], 1, nc=4)
        total_bad, _, _ = detection_loss(feats_bad, batch, [8], cfg)
        assert float(comps_good["box"]) < 0.2
        assert float(total_good) < float(total_bad)

    def test_gradients_finite_and_nonzero(self):
        cfg = LossConfig(nc=4)
        batch = self._batch()
        feats = _feats_for([10, 10, 30, 30], 1, nc=4)

        def f(x):
            t, _, _ = detection_loss([x], batch, [8], cfg)
            return t

        g = jax.grad(f)(feats[0])
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).sum()) > 0

    @pytest.mark.parametrize("use_wiseiou,nwd", [(True, False), (False, True), (True, True)])
    def test_deal_loss_options(self, use_wiseiou, nwd):
        cfg = LossConfig(nc=4, use_wiseiou=use_wiseiou, nwd=nwd)
        batch = self._batch()
        feats = _feats_for([8, 8, 28, 28], 2, nc=4)
        total, comps, new_mean = detection_loss(feats, batch, [8], cfg, iou_mean=jnp.asarray(1.0))
        assert bool(jnp.isfinite(total))
        if use_wiseiou:
            assert float(new_mean) != 1.0  # running state updated

    def test_empty_image_cls_only(self):
        cfg = LossConfig(nc=4)
        batch = {
            "bboxes": jnp.zeros((1, 8, 4)),
            "cls": jnp.zeros((1, 8), jnp.int32),
            "mask": jnp.zeros((1, 8), bool),
        }
        feats = _feats_for([8, 8, 28, 28], 2, nc=4)
        total, comps, _ = detection_loss(feats, batch, [8], cfg)
        assert float(comps["box"]) == 0.0
        assert float(comps["dfl"]) == 0.0
        assert float(comps["cls"]) > 0.0  # background must be pushed down


def test_bce_sum_matches_autodiff():
    """_bce_sum's analytic custom VJP == autodiff of the stable BCE form."""
    import numpy as np

    from experiment_yolo_tpu.utils.loss import _bce_sum, _sigmoid_bce

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 100, 8).astype(np.float32)) * 3
    t = jnp.asarray(rng.uniform(0, 1, (4, 100, 8)).astype(np.float32))
    ref = lambda a, b: _sigmoid_bce(a, b).sum(dtype=jnp.float32)
    np.testing.assert_allclose(_bce_sum(x, t), ref(x, t), rtol=1e-6)
    g0 = jax.grad(ref, argnums=(0, 1))(x, t)
    g1 = jax.grad(_bce_sum, argnums=(0, 1))(x, t)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-6)
