"""Registry matrix: every C2f_<X>/C3_<X> inner block and every
channel-preserving attention name must parse from YAML and shape-check
through DetectionModel's eval_shape stride calibration (no compiles)."""

import jax
import jax.numpy as jnp
import pytest

from experiment_yolo_tpu.nn.tasks import _ATTENTION, DetectionModel
from experiment_yolo_tpu.nn.zoo_blocks import INNER_BLOCKS

# per-inner extra args appended after c2 in the YAML (kernel sizes etc.)
EXTRA = {
    "SWC": "13",
    "iRMB_DRB": "13",
    "iRMB_SWC": "13",
    "UniRepLKNetBlock": "7",
    "DAttention": "[32, 32]",
    "FocusedLinearAttention": "[32, 32]",
    "Parc": "[32, 32]",
    "AggregatedAtt": "[32, 32], 2",
}

# attention singles whose YAML args differ from the plain no-arg form
ATTN_ARGS = {
    "DAttention": "[[16, 16]]",
    "FocusedLinearAttention": "[[16, 16]]",
    "TransNeXt_AggregatedAttention": "[[16, 16], 2]",
    "MLCA": "[]",
    "SimAM": "[]",
}


def _build(yaml_text, tmp_path, name):
    f = tmp_path / f"{name}.yaml"
    f.write_text(yaml_text)
    model = DetectionModel(str(f))
    # abstract forward through predict-shape machinery only
    x = jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32)
    vs = jax.eval_shape(lambda r, xx: model.module.init(r, xx, False), jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(lambda v, xx: model.module.apply(v, xx, False), vs, x)
    return model, outs


@pytest.mark.parametrize("inner", sorted(INNER_BLOCKS))
def test_inner_block_yaml_builds(inner, tmp_path):
    extra = EXTRA.get(inner, "")
    args = f"[64{', ' + extra if extra else ''}]"
    yaml_text = f"""
nc: 2
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, C2f_{inner}, {args}]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
head:
  - [[3, 4, 5], 1, Detect, [nc]]
"""
    model, outs = _build(yaml_text, tmp_path, f"c2f-{inner}")
    assert model.strides == (8, 16, 32)


@pytest.mark.parametrize("attn", sorted(k for k in _ATTENTION))
def test_attention_yaml_builds(attn, tmp_path):
    args = ATTN_ARGS.get(attn, "[]")
    yaml_text = f"""
nc: 2
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, {attn}, {args}]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
head:
  - [[3, 4, 5], 1, Detect, [nc]]
"""
    model, outs = _build(yaml_text, tmp_path, f"attn-{attn}")
    assert model.strides == (8, 16, 32)
