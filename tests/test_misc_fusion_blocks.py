"""Misc fusion/neck zoo tranche: LAWDS, RCSOSA, FocalModulation, CSP_EDLAN,
SRFD/DRFD, CFC_CRB/SFC_G2, CGAFusion/CAFM(Fusion), RGCSPELAN, CGLU, PPA/DASI,
FocusFeature, CSMHSA (reference extra_modules/block.py + hcfnet.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn import zoo_blocks as Z

REF = Path("/root/reference")


def _cases():
    x = jnp.zeros((1, 16, 16, 64))
    x3 = jnp.zeros((1, 16, 16, 3))
    pyr = [jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 32, 32, 96))]
    return [
        ("LAWDS", Z.LAWDS(64), x),
        ("RCSOSA", Z.RCSOSA(64, n=2), x),
        ("FocalModulation", Z.FocalModulation(), x),
        ("CSP_EDLAN", Z.CSPEDLAN(64, n=2), x),
        ("SRFD", Z.SRFD(64), x3),
        ("DRFD", Z.DRFD(128), x),
        ("CFC_CRB", Z.CFC_CRB(), x),
        ("RGCSPELAN", Z.RGCSPELAN(64, n=2), x),
        ("Faster_Block_CGLU", Z.FasterBlockCGLU(64), x),
        ("C2f_Faster_CGLU", Z.C2fX(64, inner="Faster_CGLU", n=1), x),
        ("PPA", Z.PPA(64), x),
        ("C2f_PPA", Z.C2fX(64, inner="PPA", n=1), x),
        ("CAFM", Z.CAFM(), x),
        ("FocusFeature", Z.FocusFeature((32, 64, 96)), pyr),
        ("CSMHSA", Z.CSMHSA(), [jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 16, 16, 64))]),
        ("SFC_G2", Z.SFC_G2((64, 96)), [jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 4, 4, 96))]),
        ("CGAFusion", Z.CGAFusion(), [x, x]),
        ("CAFMFusion", Z.CAFMFusion(), [x, x]),
        ("DASI", Z.DASI(64, (32, 64, 96)), pyr),
    ]


@pytest.mark.parametrize("name,om,xi", _cases(), ids=[c[0] for c in _cases()])
def test_misc_block_runs(name, om, xi):
    v = om.init(jax.random.PRNGKey(0), xi, False)
    y = om.apply(v, xi, False)
    assert np.isfinite(np.asarray(y)).all(), name


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_misc_block_param_parity():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    block = importlib.import_module("ultralytics.nn.extra_modules.block")
    hcf = importlib.import_module("ultralytics.nn.extra_modules.hcfnet")
    ref = {
        "LAWDS": block.LAWDS(64),
        "RCSOSA": block.RCSOSA(64, 64, 2),
        "FocalModulation": block.FocalModulation(64),
        "CSP_EDLAN": block.CSP_EDLAN(64, 64, 2),
        "SRFD": block.SRFD(3, 64),
        "DRFD": block.DRFD(64, 128),
        "CFC_CRB": block.CFC_CRB(64),
        "RGCSPELAN": block.RGCSPELAN(64, 64, 2),
        "Faster_Block_CGLU": block.Faster_Block_CGLU(64, 64),
        "C2f_Faster_CGLU": block.C2f_Faster_CGLU(64, 64, 1),
        "PPA": hcf.PPA(64, 64),
        "C2f_PPA": block.C2f_PPA(64, 64, 1),
        "CAFM": block.CAFM(64),
        "FocusFeature": block.FocusFeature([32, 64, 96]),
        "CSMHSA": block.CSMHSA([64, 64]),
        "SFC_G2": block.SFC_G2([64, 96]),
        "CGAFusion": block.CGAFusion(64),
        "CAFMFusion": block.CAFMFusion(64, 8),
        "DASI": hcf.DASI([32, 64, 96], 64),
    }
    for name, om, xi in _cases():
        t = sum(p.numel() for p in ref[name].parameters())
        v = jax.eval_shape(lambda om=om, xi=xi: om.init(jax.random.PRNGKey(0), xi, False))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{name}: ours {o:,} vs reference {t:,}"


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_small_registry_parity():
    """C1/C2 (modules/block.py:174/189), Bottleneck_LDConv (:611),
    BiLevelRoutingAttention legacy+nchw (attention.py:206/489)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    mb = importlib.import_module("ultralytics.nn.modules.block")
    at = importlib.import_module("ultralytics.nn.extra_modules.attention")
    from experiment_yolo_tpu.nn.extra_modules import BiLevelRoutingAttention

    x = jnp.zeros((1, 14, 14, 64))
    cases = [
        (mb.C1(64, 64, 2), Z.C1(64, n=2)),
        (mb.C2(64, 64, 2), Z.C2(64, n=2)),
        (mb.Bottleneck_LDConv(64, 64, True, 1, (4, 4)), Z._LDBottleneck(64, k=(4, 4))),
        (at.BiLevelRoutingAttention(64), BiLevelRoutingAttention()),
        (at.BiLevelRoutingAttention_nchw(64), BiLevelRoutingAttention(nchw=True)),
    ]
    for tm, om in cases:
        t = sum(p.numel() for p in tm.parameters())
        v = jax.eval_shape(lambda om=om: om.init(jax.random.PRNGKey(0), x, False))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"


def test_bra_runs():
    from experiment_yolo_tpu.nn.extra_modules import BiLevelRoutingAttention

    x = jnp.ones((2, 14, 14, 64)) * 0.2
    for m in [BiLevelRoutingAttention(), BiLevelRoutingAttention(nchw=True)]:
        v = m.init(jax.random.PRNGKey(0), x, False)
        y = m.apply(v, x, False)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
