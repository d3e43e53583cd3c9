"""YOLOv9 extras: CBLinear/CBFuse routing, DBBNCSPELAN4, RepNCSPELAN4_CAA
(reference extra block.py:4667-4720, 5047)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn import extra_modules as X

REF = Path("/root/reference")


def test_cblinear_cbfuse():
    lin = X.CBLinear((16, 32), k=1)
    x = jnp.zeros((1, 16, 16, 64))
    v = lin.init(jax.random.PRNGKey(0), x, False)
    outs = lin.apply(v, x, False)
    assert [o.shape[-1] for o in outs] == [16, 32]

    fuse = X.CBFuse((0, 1))
    a = [jnp.ones((1, 32, 32, 16)), jnp.ones((1, 16, 16, 16)) * 2]
    b = [jnp.ones((1, 16, 16, 16)) * 3, jnp.ones((1, 8, 8, 16))]
    tgt = jnp.ones((1, 16, 16, 16))
    out = fuse.apply(fuse.init(jax.random.PRNGKey(0), [a, b, tgt], False), [a, b, tgt], False)
    assert out.shape == (1, 16, 16, 16)
    # idx picks a[0] (upsampled no-op from 32->16? a[0] is 32x32 -> resized) + b[1] (8->16) + tgt
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 1 + 1 + 1)


def test_elan_variants_build(tmp_path):
    yaml = tmp_path / "v9x.yaml"
    yaml.write_text(
        """
nc: 3
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]           # 1 P2/4
  - [-1, 1, ADown, [64]]                # 2 P3/8
  - [-1, 1, DBBNCSPELAN4, [64, 64, 32, 1]]    # 3
  - [-1, 1, ADown, [64]]                # 4 P4/16
  - [-1, 1, RepNCSPELAN4_CAA, [64, 64, 32, 1]]  # 5
  - [-1, 1, ADown, [64]]                # 6 P5/32
  - [0, 1, CBLinear, [[16, 32]]]        # 7
  - [7, 1, Index, [1]]                  # 8 -> 32ch branch
head:
  - [[3, 5, 6], 1, Detect, [nc]]
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
    x = jnp.zeros((1, 16, 16, 64))
    cases = [
        (block.DBBNCSPELAN4(64, 64, 64, 32), X.RepNCSPELAN4(64, 64, 32, inner="dbb"), x),
        (block.RepNCSPELAN4_CAA(64, 64, 64, 32), X.RepNCSPELAN4(64, 64, 32, caa=True), x),
        (block.CBLinear(64, [16, 32]), X.CBLinear((16, 32)), x),
    ]
    for tm, om, xs in cases:
        t = sum(p.numel() for p in tm.parameters())
        v = jax.eval_shape(lambda om=om, xs=xs: om.init(jax.random.PRNGKey(0), xs, False))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"
