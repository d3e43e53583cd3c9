"""Soft-NMS golden test vs the reference fork's protocol (ops.py:260).

The DEAL fork replaces torchvision hard NMS with Gaussian soft-NMS in its
whole predict/val pipeline (ops.py:115-116) — our validator/predictor
default to nms_type='soft' for protocol parity.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.ops import non_max_suppression

REF = Path("/root/reference")


def test_soft_nms_basics():
    # two heavily-overlapping boxes: soft-NMS decays the second below the
    # 0.25 floor and drops it; a far-away box survives
    boxes = jnp.asarray([[[50, 50, 20, 20], [51, 51, 20, 20], [150, 150, 20, 20]]], jnp.float32)
    scores = jnp.asarray([[[0.9], [0.8], [0.6]]], jnp.float32)
    det, n = non_max_suppression(boxes, scores, conf_thres=0.001, iou_thres=0.5, nms_type="soft")
    assert int(n[0]) == 2
    assert det[0, 0, 4] == pytest.approx(0.9)
    # decayed-away duplicate is gone; with nms_type hard + same thresholds it
    # is also suppressed, but a MODERATE overlap survives hard and not soft
    boxes2 = jnp.asarray([[[50, 50, 20, 20], [58, 50, 20, 20]]], jnp.float32)
    scores2 = jnp.asarray([[[0.9], [0.3]]], jnp.float32)
    det_s, n_s = non_max_suppression(boxes2, scores2, conf_thres=0.001, iou_thres=0.25, nms_type="soft")
    det_h, n_h = non_max_suppression(boxes2, scores2, conf_thres=0.001, iou_thres=0.25, nms_type="hard")
    assert int(n_h[0]) == 1  # hard suppression kills it
    assert int(n_s[0]) == 1  # decayed 0.3*exp(-iou^2/0.5) < 0.25 floor


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_soft_nms_matches_reference():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import torch

    from ultralytics.utils import ops as tops

    rng = np.random.RandomState(0)
    a, nc = 400, 3
    # clustered boxes around a few centers so suppression actually triggers
    centers = rng.uniform(60, 260, (8, 2))
    which = rng.randint(0, 8, a)
    xy = centers[which] + rng.randn(a, 2) * 4
    wh = np.abs(rng.randn(a, 2) * 6) + 30
    boxes = np.concatenate([xy, wh], -1).astype(np.float32)  # xywh
    scores = (rng.rand(a, nc) ** 3).astype(np.float32)

    # reference pipeline: (1, 4+nc, A) prediction tensor
    pred = torch.from_numpy(np.concatenate([boxes, scores], -1).T[None])
    td = tops.non_max_suppression(pred, 0.001, 0.7, multi_label=True, max_det=300)[0].numpy()

    det, n = non_max_suppression(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        conf_thres=0.001, iou_thres=0.7, multi_label=True, max_det=300, nms_type="soft",
        pre_nms_topk=a * nc,
    )
    od = np.asarray(det[0][: int(n[0])])

    # the reference keeps its FIRST candidate in array order (init bug we do
    # not replicate) -> allow one unmatched box per side
    def match_count(src, dst):
        m = 0
        for r in src:
            d = np.abs(dst[:, :4] - r[:4]).max(-1) if len(dst) else np.asarray([9e9])
            ok = (d < 0.1) & (np.abs(dst[:, 4] - r[4]) < 1e-3) & (dst[:, 5] == r[5])
            m += bool(ok.any())
        return m
    assert match_count(td, od) >= len(td) - 1, f"{match_count(td, od)}/{len(td)}"
    assert match_count(od, td) >= len(od) - 1, f"{match_count(od, td)}/{len(od)}"


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_soft_nms_quirk_exact_vs_reference():
    """soft_first_quirk replicates the fork EXACTLY (set equality), incl.
    (a) first box kept in array order (ops.py:262 order=arange never sorted),
    (b) the last lone survivor always dropped (while order.numel() > 1),
    (c) the arbitrary first box kept even below the 0.25 floor at val conf."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import torch

    from ultralytics.utils import ops as tops

    rng = np.random.RandomState(3)
    a, nc = 300, 3
    centers = rng.uniform(60, 260, (6, 2))
    which = rng.randint(0, 6, a)
    xy = centers[which] + rng.randn(a, 2) * 4
    wh = np.abs(rng.randn(a, 2) * 6) + 30
    boxes = np.concatenate([xy, wh], -1).astype(np.float32)
    scores = (rng.rand(a, nc) ** 3).astype(np.float32)

    for conf in (0.25, 0.001):  # predictor and validator protocols
        pred = torch.from_numpy(np.concatenate([boxes, scores], -1).T[None].copy())
        td = tops.non_max_suppression(pred, conf, 0.7, multi_label=True, max_det=300)[0].numpy()
        det, n = non_max_suppression(
            jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
            conf_thres=conf, iou_thres=0.7, multi_label=True, max_det=300,
            nms_type="soft", soft_first_quirk=True, pre_nms_topk=512,
        )
        od = np.asarray(det[0][: int(n[0])])
        assert len(od) == len(td), f"conf={conf}: {len(od)} vs {len(td)}"
        # set equality (ref output is keep-ordered, ours score-sorted)
        td_s = td[np.lexsort(td.T[:5])]
        od_s = od[np.lexsort(od.T[:5])]
        np.testing.assert_allclose(od_s[:, :4], td_s[:, :4], atol=0.1)
        np.testing.assert_allclose(od_s[:, 4], td_s[:, 4], atol=1e-3)
        np.testing.assert_array_equal(od_s[:, 5], td_s[:, 5])


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_soft_nms_quirk_first_candidate_outside_topk():
    """At val conf 0.001 the fork's first kept box (lowest flat index over
    conf-passing candidates) can fall outside our pre-NMS top-k pool — it
    must be force-included."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import torch

    from ultralytics.utils import ops as tops

    rng = np.random.RandomState(1)
    a, nc = 200, 2
    xy = rng.uniform(40, 280, (a, 2))
    wh = np.abs(rng.randn(a, 2) * 5) + 25
    boxes = np.concatenate([xy, wh], -1).astype(np.float32)
    # anchor 0 has a tiny-but-passing score; the top-16 pool is filled by
    # the 150 high-score anchors, so anchor 0 is NOT in the pool
    scores = np.zeros((a, nc), np.float32)
    scores[50:, 0] = rng.uniform(0.5, 0.9, a - 50)
    scores[0, 1] = 0.002

    pred = torch.from_numpy(np.concatenate([boxes, scores], -1).T[None].copy())
    td = tops.non_max_suppression(pred, 0.001, 0.7, multi_label=True, max_det=300)[0].numpy()
    det, n = non_max_suppression(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        conf_thres=0.001, iou_thres=0.7, multi_label=True, max_det=300,
        nms_type="soft", soft_first_quirk=True, pre_nms_topk=16,
    )
    od = np.asarray(det[0][: int(n[0])])
    # the fork's first kept det is anchor 0's 0.002 box — ours must have it
    assert np.any((np.abs(od[:, 4] - 0.002) < 1e-6)), "forced first candidate missing"
    assert np.any((np.abs(td[:, 4] - 0.002) < 1e-6))
