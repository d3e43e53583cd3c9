"""IoU variant zoo golden tests vs the PyTorch reference.

Runs the reference's own ``ultralytics.utils.metrics`` implementations
(metrics.py:75-741) on random box pairs and asserts our jnp rebuilds agree:
bbox_iou flags (Shape/P/P2/MPD), Inner/Focaler transforms, and every
WiseIouLoss ltype including the round-1-missing SIoU/MPDIoU/ShapeIoU/
PIoU/PIoU2.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
STUB = Path(__file__).parent.parent / "tools" / "refstub"

pytestmark = pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")


@pytest.fixture(scope="module")
def refm():
    sys.path.insert(0, str(STUB))
    sys.path.insert(0, str(REF))
    from ultralytics.utils import metrics as ref_metrics

    return ref_metrics


def _boxes(n=32, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(10, 90, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 30, (n, 2)).astype(np.float32)
    b1 = np.concatenate([xy - wh / 2, xy + wh / 2], -1)
    jitter = rng.uniform(-6, 6, (n, 4)).astype(np.float32)
    b2 = b1 + jitter
    b2 = np.concatenate([np.minimum(b2[:, :2], b2[:, 2:] - 1), np.maximum(b2[:, 2:], b2[:, :2] + 1)], -1)
    return b1, b2


@pytest.mark.parametrize("flag", ["GIoU", "DIoU", "CIoU", "EIoU", "SIoU", "ShapeIoU", "PIoU", "PIoU2"])
def test_bbox_iou_variants_match_reference(refm, flag):
    import jax.numpy as jnp
    import torch

    from experiment_yolo_tpu.ops.boxes import bbox_iou

    b1, b2 = _boxes()
    ref = refm.bbox_iou(torch.tensor(b1), torch.tensor(b2), xywh=False, **{flag: True}).numpy().ravel()
    ours = np.asarray(bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, **{flag: True})).ravel()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_bbox_mpdiou_matches_reference(refm):
    import jax.numpy as jnp
    import torch

    from experiment_yolo_tpu.ops.boxes import bbox_iou

    b1, b2 = _boxes(seed=1)
    hw = torch.full((len(b1),), 640.0**2 * 2)
    ref = refm.bbox_mpdiou(torch.tensor(b1), torch.tensor(b2), xywh=False, mpdiou_hw=hw).numpy().ravel()
    ours = np.asarray(
        bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, MPDIoU=True,
                 mpdiou_hw=jnp.full((len(b1), 1), 640.0**2 * 2))
    ).ravel()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_inner_and_focaler_match_reference(refm):
    import jax.numpy as jnp
    import torch

    from experiment_yolo_tpu.ops.boxes import bbox_iou

    b1, b2 = _boxes(seed=2)
    ref_inner = refm.bbox_inner_iou(torch.tensor(b1), torch.tensor(b2), xywh=False, CIoU=True, ratio=0.7).numpy().ravel()
    ours_inner = np.asarray(
        bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, CIoU=True, inner=True, ratio=0.7)
    ).ravel()
    np.testing.assert_allclose(ours_inner, ref_inner, rtol=2e-4, atol=2e-5)

    ref_foc = refm.bbox_focaler_iou(torch.tensor(b1), torch.tensor(b2), xywh=False, CIoU=True, d=0.0, u=0.95).numpy().ravel()
    ours_foc = np.asarray(
        bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=False, CIoU=True, focaler=True, d=0.0, u=0.95)
    ).ravel()
    np.testing.assert_allclose(ours_foc, ref_foc, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("ltype", ["IoU", "WIoU", "GIoU", "DIoU", "CIoU", "EIoU", "SIoU", "ShapeIoU", "PIoU", "PIoU2", "MPDIoU"])
def test_wise_iou_ltypes_match_reference(refm, ltype):
    """All 11 Wise ltypes vs the reference WiseIouLoss in eval mode (no
    running-mean update) with monotonous=None (no focusing) so the raw
    per-ltype formula is compared."""
    import jax.numpy as jnp
    import torch

    from experiment_yolo_tpu.ops.boxes import wise_iou_loss

    b1, b2 = _boxes(seed=3)
    wl = refm.WiseIouLoss(ltype=ltype, monotonous=None)
    wl.eval()  # freeze iou_mean
    kwargs = {"mpdiou_hw": torch.full((len(b1),), 2 * 640.0**2)} if ltype == "MPDIoU" else {}
    ref = wl(torch.tensor(b1), torch.tensor(b2), ret_iou=False, **kwargs).detach().numpy().ravel()
    ours, _ = wise_iou_loss(
        jnp.asarray(b1), jnp.asarray(b2), jnp.asarray(1.0), ltype=ltype,
        monotonous=None, mpdiou_hw=2 * 640.0**2,
    )
    np.testing.assert_allclose(np.asarray(ours).ravel(), ref, rtol=3e-4, atol=3e-5)
