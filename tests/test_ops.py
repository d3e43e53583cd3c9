"""Ops tests: box math golden values, anchors, DFL decode, static NMS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops import (
    bbox_iou,
    bbox2dist,
    box_iou,
    dfl_decode,
    dist2bbox,
    make_anchors,
    non_max_suppression,
    wasserstein_similarity,
    wise_iou_loss,
    xywh2xyxy,
    xyxy2xywh,
)


def test_xywh_roundtrip():
    x = jnp.asarray([[10.0, 20.0, 4.0, 6.0], [0.0, 0.0, 2.0, 2.0]])
    assert jnp.allclose(xyxy2xywh(xywh2xyxy(x)), x, atol=1e-6)
    assert jnp.allclose(xywh2xyxy(x)[0], jnp.asarray([8.0, 17.0, 12.0, 23.0]))


def test_box_iou_golden():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = box_iou(a, b)[0]
    assert jnp.allclose(iou, jnp.asarray([1.0, 25.0 / 175.0, 0.0]), atol=1e-5)


def test_bbox_iou_ciou_less_than_iou_when_offset():
    # CIoU adds center-distance + aspect penalties: strictly below IoU here
    b1 = jnp.asarray([[5.0, 5.0, 4.0, 4.0]])
    b2 = jnp.asarray([[6.0, 6.0, 4.0, 8.0]])
    plain = bbox_iou(b1, b2)
    ciou = bbox_iou(b1, b2, CIoU=True)
    assert ciou[0, 0] < plain[0, 0]
    # identical boxes: all variants give exactly 1
    same = jnp.asarray([[5.0, 5.0, 4.0, 4.0]])
    assert jnp.allclose(bbox_iou(same, same, CIoU=True), 1.0, atol=1e-5)


def test_wasserstein_identity_and_decay():
    a = jnp.asarray([[0.0, 0.0, 12.0, 12.0]])
    assert wasserstein_similarity(a, a)[0, 0] > 0.999
    far = jnp.asarray([[100.0, 100.0, 112.0, 112.0]])
    assert wasserstein_similarity(a, far)[0, 0] < 0.01


def test_wise_iou_perfect_box_no_loss():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    loss, new_mean = wise_iou_loss(a, a, jnp.asarray(1.0))
    assert loss[0] < 1e-5
    assert new_mean < 1.0  # running mean decays toward observed 0


def test_make_anchors_layout():
    pts, strides = make_anchors([(2, 3), (1, 1)], [8, 16])
    assert pts.shape == (7, 2)
    # first row of the 2x3 grid: x (col) varies fastest
    np.testing.assert_allclose(np.asarray(pts[:3]), [[0.5, 0.5], [1.5, 0.5], [2.5, 0.5]])
    np.testing.assert_allclose(np.asarray(pts[3]), [0.5, 1.5])
    assert float(strides[-1, 0]) == 16.0


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.asarray([[4.0, 4.0], [10.0, 2.0]])
    dist = jnp.asarray([[1.0, 2.0, 3.0, 2.5], [0.5, 0.5, 1.0, 1.0]])
    xyxy = dist2bbox(dist, anchors, xywh=False)
    back = bbox2dist(anchors, xyxy, reg_max=16)
    assert jnp.allclose(back, dist, atol=1e-5)


def test_dfl_decode_delta_distribution():
    # all mass on bin 7 -> expectation 7 for every side
    reg_max = 16
    logits = jnp.full((1, 2, 4 * reg_max), -20.0)
    logits = logits.at[..., 7::reg_max].set(20.0)  # bin 7 of each of 4 sides
    d = dfl_decode(logits, reg_max)
    assert jnp.allclose(d, 7.0, atol=1e-3)


class TestNMS:
    def _scores(self, a, nc, hot):
        s = np.full((a, nc), 0.01, np.float32)
        for i, (anchor, cls, v) in enumerate(hot):
            s[anchor, cls] = v
        return jnp.asarray(s)

    def test_suppresses_overlaps_keeps_distinct(self):
        boxes = jnp.asarray(
            [
                [[50, 50, 20, 20], [52, 52, 20, 20], [200, 200, 30, 30], [51, 50, 20, 20]]
            ],
            jnp.float32,
        )  # xywh
        scores = self._scores(4, 3, [(0, 1, 0.9), (1, 1, 0.8), (2, 2, 0.7), (3, 1, 0.85)])[None]
        det, n = non_max_suppression(boxes, scores, conf_thres=0.25, iou_thres=0.5, max_det=10, pre_nms_topk=12)
        assert int(n[0]) == 2  # anchors 1,3 suppressed by 0; anchor 2 kept
        assert float(det[0, 0, 4]) == pytest.approx(0.9, abs=1e-5)
        assert int(det[0, 0, 5]) == 1
        assert int(det[0, 1, 5]) == 2

    def test_class_aware(self):
        # same box, different classes -> both kept (offset trick)
        boxes = jnp.asarray([[[50, 50, 20, 20], [50, 50, 20, 20]]], jnp.float32)
        scores = self._scores(2, 2, [(0, 0, 0.9), (1, 1, 0.8)])[None]
        det, n = non_max_suppression(boxes, scores, conf_thres=0.25, iou_thres=0.5, max_det=10, pre_nms_topk=4)
        assert int(n[0]) == 2
        # agnostic mode suppresses the second
        det, n = non_max_suppression(
            boxes, scores, conf_thres=0.25, iou_thres=0.5, max_det=10, pre_nms_topk=4, agnostic=True
        )
        assert int(n[0]) == 1

    def test_multilabel_emits_two_classes_per_anchor(self):
        boxes = jnp.asarray([[[50, 50, 20, 20]]], jnp.float32)
        scores = self._scores(1, 3, [(0, 0, 0.9), (0, 2, 0.6)])[None]
        det, n = non_max_suppression(
            boxes, scores, conf_thres=0.25, iou_thres=0.5, max_det=10, pre_nms_topk=3, multi_label=True
        )
        assert int(n[0]) == 2
        assert {int(det[0, 0, 5]), int(det[0, 1, 5])} == {0, 2}

    def test_conf_gate_and_padding(self):
        boxes = jnp.asarray([[[50, 50, 20, 20], [200, 200, 20, 20]]], jnp.float32)
        scores = self._scores(2, 2, [(0, 0, 0.9), (1, 1, 0.1)])[None]
        det, n = non_max_suppression(boxes, scores, conf_thres=0.25, iou_thres=0.5, max_det=5, pre_nms_topk=4)
        assert int(n[0]) == 1
        assert jnp.allclose(det[0, 1:], 0.0)  # padding rows zeroed
