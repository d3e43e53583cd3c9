"""Segment/Pose/OBB model build + forward contracts + losses.

Mirrors the reference's task heads (nn/modules/head.py:90/147/116) and task
losses (utils/loss.py:526 v8SegmentationLoss, :709 v8PoseLoss, v8OBBLoss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.tasks import (
    OBBModel,
    PoseModel,
    SegmentationModel,
    TASK_MODELS,
    guess_model_task,
)
from experiment_yolo_tpu.ops.boxes import probiou, xywhr2xyxyxyxy
from experiment_yolo_tpu.utils.loss import LossConfig
from experiment_yolo_tpu.utils import tal
from experiment_yolo_tpu.utils.task_losses import crop_mask, obb_loss, pose_loss, segmentation_loss

B, M, S = 2, 8, 64


def _det_batch(nc=3):
    bb = np.zeros((B, M, 4), np.float32)
    bb[:, 0] = [0.5, 0.5, 0.3, 0.3]
    bb[:, 1] = [0.3, 0.3, 0.2, 0.2]
    mask = np.zeros((B, M), bool)
    mask[:, :2] = True
    return {
        "bboxes": jnp.asarray(bb),
        "cls": jnp.zeros((B, M), jnp.int32),
        "mask": jnp.asarray(mask),
    }


@pytest.fixture(scope="module")
def imgs():
    return jnp.asarray(np.random.RandomState(0).rand(B, S, S, 3), jnp.float32)


def test_guess_model_task():
    assert guess_model_task("yolov8n-seg.yaml") == "segment"
    assert guess_model_task("yolov8n-pose.yaml") == "pose"
    assert guess_model_task("yolov8n-obb.yaml") == "obb"
    assert guess_model_task("yolov8n.yaml") == "detect"
    assert set(TASK_MODELS) == {"detect", "segment", "pose", "obb"}


def test_segmentation_model_and_loss(imgs):
    m = SegmentationModel("yolov8n-seg.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0))
    boxes, scores, coeffs, protos = jax.jit(m.predict)(v, imgs)
    a = sum((S // s) ** 2 for s in m.strides)
    assert boxes.shape == (B, a, 4) and scores.shape == (B, a, 3)
    assert coeffs.shape == (B, a, 32) and protos.shape == (B, S // 4, S // 4, 32)

    det, cf, pr = m.apply(v, imgs)
    masks = np.zeros((B, S // 4, S // 4), np.int32)
    masks[:, 4:10, 4:10] = 1
    masks[:, 1:3, 1:3] = 2
    batch = {**_det_batch(), "masks": jnp.asarray(masks)}

    def lf(params):
        det, cf, pr = m.apply({**v, "params": params}, imgs)
        total, comps, _ = segmentation_loss(
            [f.astype(jnp.float32) for f in det], cf, pr, batch, m.strides, LossConfig(nc=3)
        )
        return total, comps

    (total, comps), grads = jax.value_and_grad(lf, has_aux=True)(v["params"])
    assert np.isfinite(float(total)) and float(comps["seg"]) > 0
    # the mask branch must receive gradient (proto conv kernel)
    gproto = grads[f"layers_{m.detect_idx}"]["proto"]["cv3"]["conv"]["kernel"]
    assert float(jnp.abs(gproto).max()) > 0


def test_pose_model_and_loss(imgs):
    m = PoseModel("yolov8n-pose.yaml")
    v = m.init(jax.random.PRNGKey(0))
    boxes, scores, kpts = jax.jit(m.predict)(v, imgs)
    a = sum((S // s) ** 2 for s in m.strides)
    assert kpts.shape == (B, a, 17, 3)
    # visibility sigmoided to (0, 1)
    assert float(kpts[..., 2].min()) >= 0 and float(kpts[..., 2].max()) <= 1

    det, kmaps = m.apply(v, imgs)
    kp = np.zeros((B, M, 17, 3), np.float32)
    kp[:, :2, :, 0] = 0.5
    kp[:, :2, :, 1] = 0.4
    kp[:, :2, :, 2] = 2.0  # visible
    batch = {**_det_batch(1), "keypoints": jnp.asarray(kp)}
    total, comps, _ = pose_loss(
        [f.astype(jnp.float32) for f in det], kmaps, batch, m.strides, LossConfig(nc=1)
    )
    assert np.isfinite(float(total))
    assert float(comps["pose"]) > 0 and float(comps["kobj"]) > 0


def test_obb_model_and_loss(imgs):
    m = OBBModel("yolov8n-obb.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0))
    rboxes, scores = jax.jit(m.predict)(v, imgs)
    a = sum((S // s) ** 2 for s in m.strides)
    assert rboxes.shape == (B, a, 5) and scores.shape == (B, a, 3)
    # angle within the head's (-pi/4, 3pi/4) mapping
    ang = np.asarray(rboxes[..., 4])
    assert ang.min() > -np.pi / 4 - 1e-5 and ang.max() < 3 * np.pi / 4 + 1e-5

    det, amaps = m.apply(v, imgs)
    bb5 = np.zeros((B, M, 5), np.float32)
    bb5[:, 0, :4] = [0.5, 0.5, 0.3, 0.2]
    bb5[:, 1, :4] = [0.3, 0.3, 0.2, 0.1]
    bb5[:, :2, 4] = 0.3
    batch = {"bboxes": jnp.asarray(bb5), "cls": jnp.zeros((B, M), jnp.int32),
             "mask": _det_batch()["mask"]}
    total, comps = obb_loss([f.astype(jnp.float32) for f in det], amaps, batch, m.strides, LossConfig(nc=3))
    assert np.isfinite(float(total)) and set(comps) == {"box", "cls", "dfl"}


# ---------------------------------------------------------------------------
# op-level golden tests
# ---------------------------------------------------------------------------


def test_probiou_identity_and_disjoint():
    a = jnp.asarray([[10.0, 10.0, 4.0, 2.0, 0.5]])
    assert float(probiou(a, a)[0]) == pytest.approx(1.0, abs=1e-3)
    b = jnp.asarray([[100.0, 100.0, 4.0, 2.0, 0.5]])
    assert float(probiou(a, b)[0]) < 1e-3
    # rotation by pi flips the box onto itself -> still ~1
    c = jnp.asarray([[10.0, 10.0, 4.0, 2.0, 0.5 + np.pi]])
    assert float(probiou(a, c)[0]) == pytest.approx(1.0, abs=1e-3)


def test_probiou_matches_reference_formula():
    """Golden check against the torch formulas (reference metrics.py:784-840)."""
    rng = np.random.RandomState(3)
    o1 = np.abs(rng.randn(16, 5)).astype(np.float32) * [20, 20, 8, 6, 1]
    o2 = o1 + rng.randn(16, 5).astype(np.float32) * [2, 2, 1, 1, 0.2]

    def ref(obb1, obb2, eps=1e-7):
        x1, y1 = obb1[:, 0], obb1[:, 1]
        x2, y2 = obb2[:, 0], obb2[:, 1]

        def cov(b):
            a = b[:, 2] ** 2 / 12
            bb = b[:, 3] ** 2 / 12
            c = b[:, 4]
            return (a * np.cos(c) ** 2 + bb * np.sin(c) ** 2,
                    a * np.sin(c) ** 2 + bb * np.cos(c) ** 2,
                    a * np.cos(c) * np.sin(c) - bb * np.sin(c) * np.cos(c))

        a1, b1, c1 = cov(obb1)
        a2, b2, c2 = cov(obb2)
        t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.25
        t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps) * 0.5
        t3 = np.log(((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2) / (4 * np.sqrt(np.clip(a1 * b1 - c1 ** 2, 0, None) * np.clip(a2 * b2 - c2 ** 2, 0, None)) + eps) + eps) * 0.5
        bd = np.clip(t1 + t2 + t3, eps, 100.0)
        return 1 - np.sqrt(1 - np.exp(-bd) + eps)

    np.testing.assert_allclose(  # fp32 vs numpy: ~1e-3 rel near cancellation
        np.asarray(probiou(jnp.asarray(o1), jnp.asarray(o2))), ref(o1, o2), rtol=5e-3, atol=1e-4
    )


def test_xywhr2xyxyxyxy_axis_aligned():
    r = xywhr2xyxyxyxy(jnp.asarray([[5.0, 5.0, 4.0, 2.0, 0.0]]))
    corners = sorted(map(tuple, np.asarray(r[0]).round(5)))
    assert corners == [(3.0, 4.0), (3.0, 6.0), (7.0, 4.0), (7.0, 6.0)]


def test_crop_mask():
    m = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0], [0.0, 0.0, 8.0, 8.0]])
    out = crop_mask(m, boxes)
    assert float(out[0].sum()) == 16.0  # 4x4 crop
    assert float(out[1].sum()) == 64.0


def test_rotated_assign_candidates():
    """Anchors inside a rotated gt are candidates; far anchors are not."""
    centers = jnp.asarray([[10.0, 10.0], [30.0, 10.0], [10.0, 11.0]])
    rb = jnp.asarray([[[10.0, 10.0, 6.0, 4.0, 0.7]]])  # one gt
    inside = tal.select_candidates_in_rotated_gts(centers, rb)
    assert bool(inside[0, 0, 0]) and not bool(inside[0, 0, 1]) and bool(inside[0, 0, 2])
