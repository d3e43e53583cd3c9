"""OREPA family (reference extra_modules/orepa.py): branch-parameterized
reparam convs, RepVGG-OREPA hybrids, large-kernel composition, and the
C2f/C3/NCSPELAN containers built from them."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn.extra_modules import RepNCSPELAN4
from experiment_yolo_tpu.nn.zoo_blocks import (
    C2fX,
    C3X,
    OREPA,
    OREPALargeConv,
    RepVGGBlockOREPA,
)

REF = Path("/root/reference")


def test_orepa_shapes_and_grads():
    x = jnp.ones((2, 16, 16, 64)) * 0.2
    for m in [OREPA(64), OREPA(32, s=2), OREPALargeConv(64, k=7), RepVGGBlockOREPA(64),
              C2fX(64, inner="OREPA", n=1), C3X(64, inner="REPVGGOREPA", n=1),
              RepNCSPELAN4(64, 64, 32, inner="orepa"), RepNCSPELAN4(64, 64, 32, inner="drb")]:
        v = m.init(jax.random.PRNGKey(0), x, False)
        y = m.apply(v, x, False)
        assert np.isfinite(np.asarray(y)).all(), type(m).__name__
        g = jax.grad(lambda p: m.apply({**v, "params": p}, x, False).sum())(v["params"])
        tot = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(tot) and tot > 0, type(m).__name__


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_orepa_param_parity():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    orepa = importlib.import_module("ultralytics.nn.extra_modules.orepa")
    block = importlib.import_module("ultralytics.nn.extra_modules.block")

    x = jnp.zeros((1, 16, 16, 64))

    def ours(m):
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, False))
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

    cases = [
        (orepa.OREPA(64, 64, 3), OREPA(64)),
        (orepa.OREPA_LargeConv(64, 64, 7), OREPALargeConv(64, k=7)),
        (orepa.RepVGGBlock_OREPA(64, 64, 3), RepVGGBlockOREPA(64)),
        (block.C2f_OREPA(64, 64, 1), C2fX(64, inner="OREPA", n=1)),
        (block.C3_OREPA(64, 64, 1), C3X(64, inner="OREPA", n=1)),
        (block.C2f_REPVGGOREPA(64, 64, 1), C2fX(64, inner="REPVGGOREPA", n=1)),
        (block.C3_REPVGGOREPA(64, 64, 1), C3X(64, inner="REPVGGOREPA", n=1)),
        (block.OREPANCSPELAN4(64, 64, 64, 32), RepNCSPELAN4(64, 64, 32, inner="orepa")),
        (block.DRBNCSPELAN4(64, 64, 64, 32), RepNCSPELAN4(64, 64, 32, inner="drb", kernel=7)),
    ]
    for tm, om in cases:
        t = sum(p.numel() for p in tm.parameters())
        o = ours(om)
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"
