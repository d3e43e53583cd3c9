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


# Every head name the reference's extra head zoo exposes
# (/root/reference/ultralytics/nn/extra_modules/head.py — 25 public heads
# after excluding the Conv_GN/Scale/TaskDecomposition helpers) plus the six
# core heads must build through YAML.
_ALL_HEADS = [
    "Detect", "DetectAux", "Detect_Efficient", "Detect_SEAM", "Detect_MultiSEAM",
    "Detect_LSCD", "Detect_LADH", "Detect_TADDH",
    "Detect_DyHead", "Detect_DyHeadWithDCNV3", "Detect_DyHeadWithDCNV4", "Detect_DyHead_Prune",
    "Detect_AFPN_P345", "Detect_AFPN_P345_Custom", "Detect_AFPN_P2345", "Detect_AFPN_P2345_Custom",
]
_TASK_HEADS = [
    ("Segment", "[nc, 32, 64]"), ("Segment_Efficient", "[nc, 32, 64]"),
    ("Segment_LSCD", "[nc, 32, 64, 128]"), ("Segment_LADH", "[nc, 32, 64]"),
    ("Segment_TADDH", "[nc, 32, 64, 128]"),
    ("Pose", "[nc, [17, 3]]"), ("Pose_LSCD", "[nc, [17, 3], 128]"),
    ("Pose_LADH", "[nc, [17, 3]]"), ("Pose_TADDH", "[nc, [17, 3], 128]"),
    ("OBB", "[nc, 1]"), ("OBB_LSCD", "[nc, 1, 128]"),
    ("OBB_LADH", "[nc, 1]"), ("OBB_TADDH", "[nc, 1, 128]"),
]


@pytest.mark.parametrize("head", _ALL_HEADS)
def test_every_detect_head_builds(head, tmp_path):
    p2 = head.endswith("P2345") or head.endswith("P2345_Custom")
    # TADDH shares its tower across levels with FIXED in-channels == hidc
    # (reference head.py:728 share_conv), so all fed levels must be hidc wide
    w = 128 if "TADDH" in head else None
    layers = [
        "  - [-1, 1, Conv, [32, 3, 2]]",   # 0 P1
        f"  - [-1, 1, Conv, [{w or 64}, 3, 2]]",   # 1 P2
        f"  - [-1, 1, Conv, [{w or 128}, 3, 2]]",  # 2 P3
        f"  - [-1, 1, Conv, [{w or 256}, 3, 2]]",  # 3 P4
        f"  - [-1, 1, Conv, [{w or 256}, 3, 2]]",  # 4 P5
    ]
    from_idx = "[1, 2, 3, 4]" if p2 else "[2, 3, 4]"
    args = "[nc, 128]" if ("LSCD" in head or "TADDH" in head) else "[nc]"
    yaml_text = "nc: 4\nbackbone:\n" + "\n".join(layers) + f"\nhead:\n  - [{from_idx}, 1, {head}, {args}]\n"
    f = tmp_path / f"{head}.yaml"
    f.write_text(yaml_text)
    import jax

    model = DetectionModel(str(f))
    v = model.init(jax.random.PRNGKey(0))
    out, _ = model.apply(v, jnp.zeros((1, 64, 64, 3), jnp.float32), True, mutable=["batch_stats"])
    assert len(jax.tree.leaves(out)) >= 3


@pytest.mark.parametrize("head,args", _TASK_HEADS)
def test_every_task_head_builds(head, args, tmp_path):
    w = 128 if "TADDH" in head else None  # see test_every_detect_head_builds
    layers = [
        "  - [-1, 1, Conv, [32, 3, 2]]",
        "  - [-1, 1, Conv, [64, 3, 2]]",
        f"  - [-1, 1, Conv, [{w or 128}, 3, 2]]",
        f"  - [-1, 1, Conv, [{w or 256}, 3, 2]]",
        f"  - [-1, 1, Conv, [{w or 256}, 3, 2]]",
    ]
    yaml_text = "nc: 4\nbackbone:\n" + "\n".join(layers) + f"\nhead:\n  - [[2, 3, 4], 1, {head}, {args}]\n"
    f = tmp_path / f"{head}.yaml"
    f.write_text(yaml_text)
    import jax

    from experiment_yolo_tpu.nn.tasks import OBBModel, PoseModel, SegmentationModel

    cls = SegmentationModel if head.startswith("Segment") else PoseModel if head.startswith("Pose") else OBBModel
    model = cls(str(f))
    v = model.init(jax.random.PRNGKey(0))
    out, _ = model.apply(v, jnp.zeros((1, 64, 64, 3), jnp.float32), True, mutable=["batch_stats"])
    assert out is not None
