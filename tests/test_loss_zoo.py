"""Alt classification losses and ATSS assigner tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops.anchors import make_anchors
from experiment_yolo_tpu.utils import atss
from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss
from tests.test_tal_loss import _feats_for


def _batch(m=8, imgsz=64.0):
    bb = np.zeros((1, m, 4), np.float32)
    cl = np.zeros((1, m), np.int32)
    mask = np.zeros((1, m), bool)
    bb[0, 0] = [18 / imgsz, 18 / imgsz, 20 / imgsz, 20 / imgsz]
    cl[0, 0] = 2
    mask[0, 0] = True
    return {"bboxes": jnp.asarray(bb), "cls": jnp.asarray(cl), "mask": jnp.asarray(mask)}


@pytest.mark.parametrize("cls_loss", ["focal", "varifocal", "qualityfocal", "slide"])
def test_cls_losses_finite_and_discriminative(cls_loss):
    cfg = LossConfig(nc=4, cls_loss=cls_loss)
    batch = _batch()
    good, _, _ = detection_loss(_feats_for([8, 8, 28, 28], 2, nc=4), batch, [8], cfg)
    bad, _, _ = detection_loss(_feats_for([40, 40, 60, 60], 1, nc=4), batch, [8], cfg)
    assert bool(jnp.isfinite(good)) and bool(jnp.isfinite(bad))
    assert float(good) < float(bad)


def test_emaslide_threads_state():
    cfg = LossConfig(nc=4, cls_loss="emaslide")
    batch = _batch()
    feats = _feats_for([8, 8, 28, 28], 2, nc=4)
    total, comps, new_iou, new_slide = detection_loss(
        feats, batch, [8], cfg, iou_mean=jnp.asarray(1.0),
        slide_mean=jnp.asarray(1.0), step=jnp.asarray(10, jnp.int32),
    )
    assert bool(jnp.isfinite(total))
    assert float(new_slide) != 1.0  # running state updated


def test_atss_assigner_geometry():
    anchors, strides = make_anchors([(8, 8)], [8])
    anc_pix = anchors * strides
    m = 8
    gt_b = np.zeros((1, m, 4), np.float32)
    gt_l = np.zeros((1, m), np.int32)
    mask = np.zeros((1, m), bool)
    gt_b[0, 0] = [8.0, 8.0, 40.0, 40.0]
    gt_l[0, 0] = 1
    mask[0, 0] = True
    a = anc_pix.shape[0]
    pd = jnp.broadcast_to(jnp.asarray(gt_b)[:, 0][:, None], (1, a, 4))
    res = atss.assign(pd, anc_pix, strides, ((8, 8),), (8,),
                      jnp.asarray(gt_l), jnp.asarray(gt_b), jnp.asarray(mask), num_classes=4)
    fg = np.asarray(res.fg_mask[0])
    assert fg.sum() > 0
    inside = np.asarray((anc_pix[:, 0] > 8) & (anc_pix[:, 0] < 40) & (anc_pix[:, 1] > 8) & (anc_pix[:, 1] < 40))
    assert not np.any(fg & ~inside)
    assert np.all(np.asarray(res.target_labels[0])[fg] == 1)
    # soft labels scaled by predicted IoU (pd == gt -> iou 1 -> score 1)
    ts = np.asarray(res.target_scores[0])
    assert ts[fg, 1].max() == pytest.approx(1.0, abs=1e-5)
    # no gt -> no fg
    res0 = atss.assign(pd, anc_pix, strides, ((8, 8),), (8,),
                       jnp.asarray(gt_l), jnp.asarray(gt_b), jnp.zeros_like(jnp.asarray(mask)), num_classes=4)
    assert int(res0.fg_mask.sum()) == 0


def test_atss_via_detection_loss():
    cfg = LossConfig(nc=4, assigner="atss")
    batch = _batch()
    total, comps, _ = detection_loss(_feats_for([8, 8, 28, 28], 2, nc=4), batch, [8], cfg)
    assert bool(jnp.isfinite(total))
    assert float(comps["box"]) < 1.0  # perfect boxes assigned positively


@pytest.mark.parametrize("iou_type", ["GIoU", "SIoU", "ShapeIoU", "PIoU", "PIoU2", "MPDIoU"])
def test_detection_loss_iou_type_plumbing(iou_type):
    """Each plain-IoU variant flows through detection_loss (finite + grads)."""
    cfg = LossConfig(nc=4, iou_type=iou_type, inner_iou=iou_type == "SIoU", focaler_iou=iou_type == "GIoU")
    total, comps, _ = detection_loss(_feats_for([8, 8, 28, 28], 2, nc=4), _batch(), [8], cfg)
    assert np.isfinite(float(total)) and np.isfinite(float(comps["box"]))


@pytest.mark.parametrize("ltype", ["SIoU", "MPDIoU", "ShapeIoU", "PIoU", "PIoU2"])
def test_detection_loss_wise_ltype_plumbing(ltype):
    cfg = LossConfig(nc=4, use_wiseiou=True, wiou_ltype=ltype)
    total, comps, new_mean = detection_loss(_feats_for([8, 8, 28, 28], 2, nc=4), _batch(), [8], cfg, jnp.asarray(1.0))
    assert np.isfinite(float(total)) and np.isfinite(float(new_mean))
