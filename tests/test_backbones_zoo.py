"""Backbone zoo tranche 2: EfficientViT / RepViT / LSKNet / MobileNetV4.

Shape + channel contract per backbone, full-model build through the Index
node, and param-count parity against the reference constructors
(nn/backbone/{efficientViT,repvit,lsknet,mobilenetv4}.py) — same structure
=> same trainable-parameter count.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from experiment_yolo_tpu.nn.backbones import (
    RMT,
    EfficientViT,
    LSKNet,
    MobileNetV4,
    RepViT,
    SwinTransformer,
    UniRepLKNet,
    VanillaNet,
    WHOLE_BACKBONES,
)

REF = Path("/root/reference")


CASES = [
    (EfficientViT, "m0", 3),  # -> [P3, P4, P5]
    (RepViT, "m0_9", 4),
    (LSKNet, "t", 4),
    (MobileNetV4, "conv_small", 4),
    (SwinTransformer, "tiny", 4),
    (UniRepLKNet, "a", 4),
    (VanillaNet, "6", 4),
    (RMT, "t", 4),
]


@pytest.mark.parametrize("cls,variant,n_out", CASES)
def test_backbone_shapes(cls, variant, n_out):
    m = cls(variant=variant)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, False))()
    outs = jax.jit(lambda v: m.apply(v, x, False))(variables)
    assert len(outs) == n_out
    chans = cls.channels(variant)
    strides = (8, 16, 32) if n_out == 3 else (4, 8, 16, 32)
    for o, c, s in zip(outs, chans, strides):
        assert o.shape == (1, 64 // s, 64 // s, c), (o.shape, c, s)


def test_full_model_with_repvit_backbone(tmp_path):
    yaml = tmp_path / "repvit-det.yaml"
    yaml.write_text(
        """
nc: 3
backbone:
  - [-1, 1, repvit_m0_9, []]   # 0 -> [P2, P3, P4, P5]
  - [0, 1, Index, [1]]         # 1  P3
  - [0, 1, Index, [2]]         # 2  P4
  - [0, 1, Index, [3]]         # 3  P5
head:
  - [[1, 2, 3], 1, Detect, [nc]]
"""
    )
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel(str(yaml))
    assert model.strides == (8, 16, 32)
    variables = model.init(jax.random.PRNGKey(0))
    boxes, scores = model.predict(variables, jnp.zeros((1, 64, 64, 3)))
    assert scores.shape[-1] == 3


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
@pytest.mark.parametrize(
    "name",
    ["EfficientViT_M0", "repvit_m0_9", "lsknet_t", "MobileNetV4ConvSmall", "SwinTransformer_Tiny", "unireplknet_a", "vanillanet_6", "RMT_T", "CSWin_tiny", "PKINET_T", "efficientformerv2_s0", "transnext_micro"],
)
def test_param_count_parity(name):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    mod_of = {
        "EfficientViT_M0": "ultralytics.nn.backbone.efficientViT",
        "repvit_m0_9": "ultralytics.nn.backbone.repvit",
        "lsknet_t": "ultralytics.nn.backbone.lsknet",
        "MobileNetV4ConvSmall": "ultralytics.nn.backbone.mobilenetv4",
        "SwinTransformer_Tiny": "ultralytics.nn.backbone.SwinTransformer",
        "unireplknet_a": "ultralytics.nn.backbone.UniRepLKNet",
        "vanillanet_6": "ultralytics.nn.backbone.VanillaNet",
        "RMT_T": "ultralytics.nn.backbone.rmt",
        "CSWin_tiny": "ultralytics.nn.backbone.CSwomTramsformer",
        "PKINET_T": "ultralytics.nn.backbone.pkinet",
        "efficientformerv2_s0": "ultralytics.nn.backbone.EfficientFormerV2",
        "transnext_micro": "ultralytics.nn.backbone.TransNext",
    }
    tmodel = getattr(importlib.import_module(mod_of[name]), name)()
    t_params = sum(p.numel() for p in tmodel.parameters())

    cls, variant = WHOLE_BACKBONES[name]
    m = cls(variant=variant)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, False))
    import numpy as np

    o_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert o_params == t_params, f"{name}: ours {o_params:,} vs reference {t_params:,}"
    # channel contract matches the reference's measured .channel list
    assert tuple(tmodel.channel) == tuple(cls.channels(variant))


def test_cswin_pkinet_shapes():
    from experiment_yolo_tpu.nn.backbones import CSWin, PKINet

    x = jnp.zeros((1, 64, 64, 3))
    m = CSWin(variant="tiny")
    v = m.init(jax.random.PRNGKey(0), x, False)
    outs = m.apply(v, x, False)
    assert [o.shape[1:] for o in outs] == [(16, 16, 64), (8, 8, 128), (4, 4, 256), (2, 2, 512)]

    m = PKINet(variant="t")
    v = m.init(jax.random.PRNGKey(0), x, False)
    outs = m.apply(v, x, False)  # five levels: /2 /4 /8 /16 /32
    assert [o.shape[-1] for o in outs] == [16, 32, 64, 128, 256]
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_revcol_param_parity():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    from experiment_yolo_tpu.nn.backbones import RevCol

    rv = importlib.import_module("ultralytics.nn.backbone.revcol")
    tm = rv.RevCol()
    t = sum(p.numel() for p in tm.parameters())
    m = RevCol()
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False))
    import numpy as np

    o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert o == t
    assert tuple(tm.channel) == RevCol.channels()


def test_revcol_runs():
    from experiment_yolo_tpu.nn.backbones import RevCol

    m = RevCol(num_subnet=2, layers=(1, 1, 2, 1))
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    outs = m.apply(v, x, False)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
