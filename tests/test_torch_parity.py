"""Forward-parity vs the PyTorch reference: convert random reference weights
into our pytree and compare raw head outputs numerically.

This is the strongest architecture-parity check (BASELINE config #1): same
weights, same input => same outputs within fp tolerance. Requires the
read-only reference checkout and the refstub import shims; skipped
elsewhere.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
STUB = Path(__file__).resolve().parents[1] / "tools" / "refstub"

pytestmark = pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")


@pytest.fixture(scope="module")
def torch_ref():
    sys.path.insert(0, str(STUB))
    sys.path.insert(0, str(REF))
    import torch  # noqa: F401

    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    return TorchDetectionModel


@pytest.mark.slow
@pytest.mark.parametrize(
    "cfg",
    [
        "yolov8-ASF-P2P2.yaml",  # DEAL-YOLO
        "yolov8-LD-P2.yaml",  # DEAL-YOLO-LD (LDConv: bilinear float-order ~4e-4)
        "yolov8-ASF-P2.yaml",
        "yolov8-p2.yaml",
        "yolov8-ASF.yaml",
        # NOTE: the reference's own yolov8.yaml (MBConv backbone) cannot be
        # built by the reference itself — its parse_model passes the
        # activation class where MBConv expects expand_ratio (TypeError),
        # so no parity check is possible for that config.
    ],
)
def test_forward_parity_with_reference(torch_ref, cfg):
    import torch

    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils.torch_convert import convert_state_dict

    torch.manual_seed(0)
    tmodel = torch_ref(str(REF / "ultralytics" / "cfg" / "models" / cfg), verbose=False)
    tmodel.eval()
    state = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}

    ours = DetectionModel(cfg)
    variables = convert_state_dict(state, ours)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 128, 128).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x))
    t_feats = t_out[1] if isinstance(t_out, tuple) else t_out  # raw maps (B, no, H, W)

    import jax.numpy as jnp

    j_feats = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(j_feats) == len(t_feats)
    for tf, jf in zip(t_feats, j_feats):
        tf = tf.detach().cpu().numpy()
        jf = np.transpose(np.asarray(jf), (0, 3, 1, 2))
        assert tf.shape == jf.shape
        err = np.abs(tf - jf).max()
        assert err < 2e-3, f"forward mismatch: max abs err {err}"
