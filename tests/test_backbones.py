"""Whole-backbone tests: FasterNet pyramid + Index node in a full model."""

import jax
import jax.numpy as jnp
import pytest

from experiment_yolo_tpu.nn.backbones import FasterNet
from experiment_yolo_tpu.nn.tasks import DetectionModel


def test_fasternet_pyramid_shapes():
    m = FasterNet(variant="t0")
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 40),
        (1, 16, 16, 80),
        (1, 8, 8, 160),
        (1, 4, 4, 320),
    ]


def test_convnextv2_pyramid_shapes():
    from experiment_yolo_tpu.nn.backbones import ConvNeXtV2

    m = ConvNeXtV2(variant="atto")
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 40),
        (1, 16, 16, 80),
        (1, 8, 8, 160),
        (1, 4, 4, 320),
    ]


def test_fasternet_detection_model(tmp_path):
    yaml_text = """
nc: 3
backbone:
  - [-1, 1, FasterNet, [t0]]   # 0 -> [P2, P3, P4, P5]
  - [0, 1, Index, [1]]         # 1  P3 (80ch)
  - [0, 1, Index, [2]]         # 2  P4 (160ch)
  - [0, 1, Index, [3]]         # 3  P5 (320ch)
head:
  - [-1, 1, nn.Upsample, [None, 2, nearest]]  # 4
  - [[-1, 2], 1, Concat, [1]]                 # 5
  - [-1, 1, C2f, [128]]                       # 6
  - [[6, 3], 1, Detect, [nc]]                 # 7
"""
    p = tmp_path / "fasternet.yaml"
    p.write_text(yaml_text)
    m = DetectionModel(str(p))
    assert m.strides == (16, 32)
    v = m.init(jax.random.PRNGKey(0))
    outs = m.apply(v, jnp.zeros((1, 128, 128, 3)))
    assert [o.shape[1:3] for o in outs] == [(8, 8), (4, 4)]
    # decode path works end-to-end
    boxes, scores = m.predict(v, jnp.zeros((1, 128, 128, 3)))
    assert boxes.shape == (1, 8 * 8 + 4 * 4, 4)
