"""SAM family: component shapes, prompt/decode flow, param parity vs the
reference Sam (models/sam/build.py:_build_sam)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.models.sam import SAM, SAMPredictor, build_sam

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def small_sam():
    model = build_sam("vit_b", img_size=128)  # 8x8 embedding grid
    x = jnp.zeros((1, 128, 128, 3))
    pts = jnp.zeros((1, 2, 2))
    lbl = jnp.ones((1, 2))
    variables = model.init(jax.random.PRNGKey(0), x, pts, lbl)
    return model, variables


def test_sam_forward_shapes(small_sam):
    model, variables = small_sam
    x = jnp.zeros((1, 128, 128, 3))
    pts = jnp.asarray([[[40.0, 40.0], [90.0, 90.0]]])
    lbl = jnp.asarray([[1.0, 0.0]])
    masks, iou = model.apply(variables, x, pts, lbl, True)
    assert masks.shape == (1, 3, 32, 32)  # 4x the 8x8 embedding
    assert iou.shape == (1, 3)
    m1, i1 = model.apply(variables, x, pts, lbl, False)
    assert m1.shape == (1, 1, 32, 32)
    assert np.isfinite(np.asarray(masks)).all()


def test_sam_predictor_flow(small_sam):
    model, variables = small_sam
    pred = SAMPredictor(model, variables, imgsz=128)
    img = (np.random.RandomState(0).rand(100, 80, 3) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, iou = pred.predict(np.asarray([[40.0, 50.0]]), np.asarray([1.0]))
    assert masks.shape == (3, 32, 32) and masks.dtype == bool
    out = pred.everything(points_per_side=2, iou_thresh=-1.0)
    assert len(out) == 4  # every grid point kept at threshold -1


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_sam_param_parity():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    from ultralytics.models.sam.build import build_sam_vit_b

    tm = build_sam_vit_b()
    t_params = sum(p.numel() for p in tm.parameters())
    # the reference registers one extra buffer-like param set? count ours
    model = build_sam("vit_b", img_size=1024)
    v = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1)))
    )
    o_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    # our pe_gaussian is a param (torch: buffer) and torch counts no buffers
    o_params -= 2 * 128  # PositionEmbeddingRandom gaussian matrix
    assert o_params == t_params, f"ours {o_params:,} vs reference {t_params:,}"
