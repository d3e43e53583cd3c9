"""C2f_X / C3_X zoo tranche: shape contracts + param-count parity vs the
reference classes (extra_modules/block.py) + full-model builds."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.zoo_blocks import C2fX, C3X, INNER_BLOCKS

REF = Path("/root/reference")

INNERS = sorted(INNER_BLOCKS)


@pytest.mark.parametrize("inner", INNERS)
@pytest.mark.parametrize("container", [C2fX, C3X])
def test_zoo_shapes(inner, container):
    m = container(64, inner=inner, n=1)
    x = jnp.zeros((1, 32, 32, 64))
    variables = m.init(jax.random.PRNGKey(0), x, False)
    y = m.apply(variables, x, False)
    assert y.shape == (1, 32, 32, 64)
    # gradients flow through the inner block
    g = jax.grad(lambda p: m.apply({**variables, "params": p}, x, False).sum())(variables["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_yaml_build_with_zoo_blocks(tmp_path):
    yaml = tmp_path / "zoo-det.yaml"
    yaml.write_text(
        """
nc: 3
backbone:
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [128, 3, 2]]
  - [-1, 1, C2f_Faster, [128]]
  - [-1, 1, Conv, [256, 3, 2]]
  - [-1, 1, C2f_DWR, [256]]
  - [-1, 1, Conv, [512, 3, 2]]
  - [-1, 1, C3_MSBlock, [512]]
  - [-1, 1, ContextGuidedBlock_Down, []]
  - [-1, 1, EMSConv, []]
head:
  - [[4, 6, 8], 1, Detect, [nc]]
"""
    )
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    model = DetectionModel(str(yaml))
    variables = model.init(jax.random.PRNGKey(0))
    boxes, scores = model.predict(variables, jnp.zeros((1, 64, 64, 3)))
    assert scores.shape[-1] == 3


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
@pytest.mark.parametrize(
    "name",
    [
        "C2f_Faster", "C3_Faster", "C2f_Faster_EMA", "C2f_ContextGuided",
        "C2f_DWR", "C3_DWR", "C2f_MSBlock", "C2f_SCConv", "C2f_ScConv", "C2f_RFCBAMConv", "C2f_RFCAConv", "C2f_AKConv", "C3_AKConv",
        "C2f_EMSC", "C2f_EMSCP", "C2f_RFAConv", "C3_RFAConv", "C2f_iRMB", "C2f_DBB", "C3_DBB", "C2f_DySnakeConv", "C3_DySnakeConv", "C2f_VSS", "C3_LVMB", "C2f_ODConv", "C3_ODConv", "C2f_DynamicConv", "C2f_GhostDynamicConv", "C2f_DRB", "C3_DRB", "C2f_UniRepLKNetBlock", "C2f_DCNv2", "C3_DCNv2", "C2f_MLCA",
        "C2f_RVB", "C3_RVB", "C2f_RVB_SE", "C2f_RVB_EMA",
        "C2f_SWC", "C3_SWC", "C2f_iRMB_Cascaded", "C2f_iRMB_DRB", "C2f_iRMB_SWC",
        "C2f_CloAtt", "C3_CloAtt", "C2f_DLKA", "C3_DLKA", "C2f_DCNv2_Dynamic",
        "C2f_DWR_DRB", "C3_DWR_DRB", "C2f_DAttention", "C2f_FocusedLinearAttention",
        "C2f_FADC", "C3_FADC", "C2f_Parc", "C3_Parc", "C2f_RetBlock", "C3_RetBlock",
        "C2f_PKIModule", "C3_PKIModule", "C2f_AggregatedAtt", "C3_AggregatedAtt",
    ],
)
def test_param_count_parity(name):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    block = importlib.import_module("ultralytics.nn.extra_modules.block")
    tcls = getattr(block, name)
    # EMSConv asserts c/4 (per-chain channels / 4) >= 16 in the reference
    c = 128 if "EMSC" in name else 64
    # kernel_size-signature classes (C3_SWC etc.): pass it explicitly
    extra = {"C2f_SWC": 13, "C3_SWC": 13, "C2f_iRMB_DRB": 13, "C2f_iRMB_SWC": 13,
             "C2f_DAttention": (16, 16), "C2f_FocusedLinearAttention": (16, 16),
             "C2f_Parc": (16, 16), "C3_Parc": (16, 16)}.get(name)
    if "AggregatedAtt" in name:
        extra = ((16, 16), 2)
        tm = tcls(c, c, 1, [16, 16], 2)
    elif extra is None:
        tm = tcls(c, c, 1)
    else:
        tm = tcls(c, c, 1, extra)
    t_params = sum(p.numel() for p in tm.parameters())

    container = C2fX if name.startswith("C2f_") else C3X
    inner = name.split("_", 1)[1]
    m = container(c, inner=inner, n=1, extra=extra)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, c)), False))
    o_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert o_params == t_params, f"{name}: ours {o_params:,} vs reference {t_params:,}"


def test_hsfpn_sdi_hwd_multiply():
    """HS-FPN gates, SDI fusion, HWD wavelet downsample, Multiply
    (block.py:3634-3955)."""
    from experiment_yolo_tpu.nn import zoo_blocks as Z

    x = jnp.zeros((1, 16, 16, 64))
    for mod, gate_only in [
        (Z.ChannelAttentionHSFPN(), False), (Z.ChannelAttentionHSFPN(flag=False), True),
        (Z.ELAHSFPN(), False), (Z.CAHSFPN(), False), (Z.CAAHSFPN(), False),
    ]:
        v = mod.init(jax.random.PRNGKey(0), x, True)
        args = {"params": v["params"]}
        if "batch_stats" in v:
            args["batch_stats"] = v["batch_stats"]
        y = mod.apply(args, x, False)
        if gate_only:
            assert y.shape[-1] == x.shape[-1]
        else:
            assert y.shape == x.shape

    hwd = Z.HWD(32)
    v = hwd.init(jax.random.PRNGKey(0), x, False)
    assert hwd.apply(v, x, False).shape == (1, 8, 8, 32)

    sdi = Z.SDI(64, inc=(64, 32, 128))
    xs = [jnp.ones((1, 16, 16, 64)), jnp.ones((1, 32, 32, 32)), jnp.ones((1, 8, 8, 128))]
    v = sdi.init(jax.random.PRNGKey(0), xs, False)
    assert sdi.apply(v, xs, False).shape == (1, 16, 16, 64)

    mul = Z.Multiply()
    v = mul.init(jax.random.PRNGKey(0), [x, x], False)
    np.testing.assert_array_equal(mul.apply(v, [jnp.ones_like(x) * 2, jnp.ones_like(x) * 3], False), 6.0)


def test_hsfpn_param_parity():
    import importlib
    import sys
    from pathlib import Path

    ref = Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(ref))
    block = importlib.import_module("ultralytics.nn.extra_modules.block")
    from experiment_yolo_tpu.nn import zoo_blocks as Z

    x = jnp.zeros((1, 16, 16, 64))
    cases = [
        (block.ChannelAttention_HSFPN(64), Z.ChannelAttentionHSFPN(), x),
        (block.ELA_HSFPN(64), Z.ELAHSFPN(), x),
        (block.CA_HSFPN(64), Z.CAHSFPN(), x),
        (block.CAA_HSFPN(64), Z.CAAHSFPN(), x),
        (block.HWD(64, 32), Z.HWD(32), x),
        (block.SDI([64, 32]), Z.SDI(64, inc=(64, 32)),
         [jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 32, 32, 32))]),
    ]
    for tm, om, xs in cases:
        t = sum(p.numel() for p in tm.parameters())
        v = jax.eval_shape(lambda om=om, xs=xs: om.init(jax.random.PRNGKey(0), xs, True))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_sppf_lska_c3tr_dgcst_parity():
    """SPPF_LSKA (block.py:2625), C3TR (modules/block.py:279), DGCST
    (block.py:4901), LocalWindowAttention (attention.py:1683)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    from experiment_yolo_tpu.nn import zoo_blocks as Z
    from experiment_yolo_tpu.nn.extra_modules import LocalWindowAttention

    block = importlib.import_module("ultralytics.nn.extra_modules.block")
    mblock = importlib.import_module("ultralytics.nn.modules.block")
    attn = importlib.import_module("ultralytics.nn.extra_modules.attention")

    x = jnp.zeros((1, 16, 16, 64))
    cases = [
        (block.SPPF_LSKA(64, 64), Z.SPPFLSKA(64), x),
        (mblock.C3TR(64, 64, 2), Z.C3TR(64, n=2), x),
        (block.DGCST(64, 64), Z.DGCST(64), x),
        (attn.LocalWindowAttention(64), LocalWindowAttention(), x),
    ]
    for tm, om, xi in cases:
        t = sum(p.numel() for p in tm.parameters())
        v = jax.eval_shape(lambda om=om: om.init(jax.random.PRNGKey(0), xi, False))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"


def test_sppf_lska_c3tr_dgcst_shapes():
    from experiment_yolo_tpu.nn import zoo_blocks as Z

    x = jnp.zeros((2, 16, 16, 64))
    for m in [Z.SPPFLSKA(64), Z.C3TR(64), Z.DGCST(64), Z.ReparamLKConv(64, 13, groups=4)]:
        v = m.init(jax.random.PRNGKey(0), x, False)
        assert m.apply(v, x, False).shape == x.shape, type(m).__name__
