"""GOLD-YOLO / YOLOv6 / DAMO / v7 block tranche: shapes, a full
neck-style build, and param parity vs the reference (extra block.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn import zoo_blocks as Z

REF = Path("/root/reference")


def _init_apply(mod, xs):
    v = mod.init(jax.random.PRNGKey(0), xs, False)
    return mod.apply(v, xs, False)


def test_gold_shapes():
    x = jnp.zeros((1, 16, 16, 64))
    assert _init_apply(Z.RepVGGBlock(64), x).shape == (1, 16, 16, 64)
    assert _init_apply(Z.IFM((32, 32)), x).shape == (1, 16, 16, 64)
    assert _init_apply(Z.TopBasicLayer((32, 48), block_num=1), x).shape == (1, 16, 16, 80)
    inj = Z.InjectionMultiSum(32, (32, 32), 0)
    out = _init_apply(inj, [jnp.zeros((1, 32, 32, 48)), jnp.zeros((1, 16, 16, 64))])
    assert out.shape == (1, 32, 32, 32)
    assert _init_apply(Z.CSPStage(64, n=2), x).shape == (1, 16, 16, 64)
    assert _init_apply(Z.RepBlock(96, n=3), x).shape == (1, 16, 16, 96)
    assert _init_apply(Z.V7DownSampling(64), x).shape == (1, 8, 8, 64)
    bf = Z.BiFusion(32, inc=(64, 64, 64))
    out = _init_apply(bf, [jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 32, 32, 64))])
    assert out.shape == (1, 16, 16, 32)


def test_yaml_build_gold_modules(tmp_path):
    yaml = tmp_path / "gold-mini.yaml"
    yaml.write_text(
        """
nc: 3
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]    # 1 P2/4
  - [-1, 1, V7DownSampling, [64]]  # 2 P3/8
  - [-1, 2, RepBlock, [64]]      # 3
  - [-1, 1, Conv, [128, 3, 2]]   # 4 P4/16
  - [-1, 2, CSPStage, [128]]     # 5
  - [-1, 1, Conv, [128, 3, 2]]   # 6 P5/32
head:
  - [[3, 5, 6], 1, SimFusion_4in, []]    # 7 wait needs 4 -> use 3 inputs? use BiFusion instead
"""
    )
    # SimFusion_4in needs 4 inputs; simpler graph: BiFusion neck
    yaml.write_text(
        """
nc: 3
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]      # 1 P2/4
  - [-1, 1, V7DownSampling, [64]]  # 2 P3/8
  - [-1, 2, RepBlock, [64]]        # 3
  - [-1, 1, Conv, [64, 3, 2]]      # 4 P4/16
  - [-1, 2, CSPStage, [64]]        # 5
  - [-1, 1, Conv, [64, 3, 2]]      # 6 P5/32
head:
  - [[6, 5, 3], 1, BiFusion, [64]] # 7 P4-level fusion
  - [-1, 1, C2f_EMBC, [64]]        # 8
  - [[3, 8, 6], 1, Detect, [nc]]
"""
    )
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel(str(yaml))
    variables = model.init(jax.random.PRNGKey(0))
    boxes, scores = model.predict(variables, jnp.zeros((1, 64, 64, 3)))
    assert scores.shape[-1] == 3


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_param_count_parity():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    block = importlib.import_module("ultralytics.nn.extra_modules.block")

    def count(tm):
        return sum(p.numel() for p in tm.parameters())

    def ours(mod, xs):
        v = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), xs, False))
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

    x64 = jnp.zeros((1, 16, 16, 64))
    cases = [
        (block.RepVGGBlock(64, 64), Z.RepVGGBlock(64), x64),
        (block.IFM(64, [32, 32]), Z.IFM((32, 32)), x64),
        (block.CSPStage(64, 64, 2), Z.CSPStage(64, n=2), x64),
        (block.RepBlock(64, 96, 3), Z.RepBlock(96, n=3), x64),
        (block.V7DownSampling(64, 64), Z.V7DownSampling(64), x64),
        (block.TopBasicLayer(64, [32, 48], block_num=1), Z.TopBasicLayer((32, 48), block_num=1), x64),
        (block.InjectionMultiSum_Auto_pool(48, 32, [32, 32], 0), Z.InjectionMultiSum(32, (32, 32), 0),
         [jnp.zeros((1, 32, 32, 48)), jnp.zeros((1, 16, 16, 64))]),
        (block.C2f_EMBC(64, 64, 1), Z.C2fX(64, inner="EMBC", n=1), x64),
    ]
    for tm, om, xs in cases:
        t, o = count(tm), ours(om, xs)
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"
