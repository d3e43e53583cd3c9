"""DetectAux: auxiliary one-to-many training head (reference
extra_modules/head.py:235 + utils/loss.py:459 compute_loss_aux)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.tasks import DetectionModel
from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def model_and_vars():
    model = DetectionModel("yolov8n-aux.yaml", nc=3)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_build_and_modes(model_and_vars):
    model, variables = model_and_vars
    assert model.head_type == "DetectAux"
    assert model.strides == (8, 16, 32)
    x = jnp.zeros((1, 64, 64, 3))
    # eval: main maps only -> decode path unchanged
    feats = model.apply(variables, x, train=False)
    assert len(feats) == 3
    boxes, scores = model.predict(variables, x)
    assert scores.shape[-1] == 3
    # train: main + aux maps
    feats_t, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert len(feats_t) == 6
    for f_main, f_aux in zip(feats_t[:3], feats_t[3:]):
        assert f_main.shape == f_aux.shape


def test_aux_loss_and_grads(model_and_vars):
    model, variables = model_and_vars
    cfg = LossConfig(nc=3)
    rng = np.random.RandomState(0)
    batch = {
        "bboxes": jnp.asarray(rng.uniform(0.3, 0.6, (2, 4, 4)).astype(np.float32)),
        "cls": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.asarray(np.tile(np.arange(4) < 2, (2, 1))),
    }
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))

    def loss_fn(params):
        feats, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x, train=True, mutable=["batch_stats"]
        )
        total, comps, _ = detection_loss([f.astype(jnp.float32) for f in feats], batch, model.strides, cfg)
        return total, comps

    (total, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    # aux branch contributes: its conv kernels get nonzero gradients
    g_aux = grads[f"layers_{model.detect_idx}"]["cv4_0_2"]["kernel"]
    assert float(jnp.abs(g_aux).sum()) > 0

    # aux adds loss on top of the main head (same feats, ratio 0.25)
    feats, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    feats = [f.astype(jnp.float32) for f in feats]
    total_with, _, _ = detection_loss(feats, batch, model.strides, cfg)
    total_main, _, _ = detection_loss(feats[:3], batch, model.strides, cfg)
    assert float(total_with) > float(total_main)


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_forward_parity_with_reference():
    """Same weights -> same 6 raw train-mode maps as the reference DetectAux."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import torch

    from ultralytics.nn.tasks import DetectionModel as TDM

    from experiment_yolo_tpu.utils.torch_convert import convert_state_dict

    cfg = Path(__file__).resolve().parents[1] / "experiment_yolo_tpu" / "cfg" / "models" / "yolov8-aux.yaml"
    torch.manual_seed(0)
    tmodel = TDM(str(cfg), verbose=False)
    tmodel.train()
    state = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}

    ours = DetectionModel("yolov8-aux.yaml")
    variables = convert_state_dict(state, ours)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats, _ = ours.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    assert len(t_out) == len(feats) == 6
    for i, (t, f) in enumerate(zip(t_out, feats)):
        t_np = t.numpy().transpose(0, 2, 3, 1)  # BCHW -> BHWC
        np.testing.assert_allclose(np.asarray(f), t_np, atol=1e-3, rtol=1e-3, err_msg=f"level {i}")
