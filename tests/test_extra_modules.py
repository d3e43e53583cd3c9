"""Extra module zoo: shape/behavior tests + YAML registry integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.nn import extra_modules as X
from experiment_yolo_tpu.nn.tasks import DetectionModel

RNG = jax.random.PRNGKey(0)
X_IN = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32))


def _run(mod, x=X_IN, train=False):
    v = mod.init(RNG, x)
    out = mod.apply(v, x, train, mutable=["batch_stats"] if train else False)
    return out[0] if train else out


CH_PRESERVING = [
    X.SEAttention(),
    X.EffectiveSE(),
    X.SimAM(),
    X.CoordAtt(),
    X.EMAAttention(factor=8),
    X.CBAM(),
    X.ChannelAttention(),
    X.SpatialAttention(),
    X.TripletAttention(),
    X.DySample(scale=2, groups=4),
    X.CARAFE(),
    X.ELA(),
    X.CAA(),
    X.LSKBlock(),
]


@pytest.mark.parametrize("mod", CH_PRESERVING, ids=lambda m: type(m).__name__)
def test_channel_preserving_modules(mod):
    out = _run(mod)
    if isinstance(mod, (X.DySample, X.CARAFE)):
        assert out.shape == (2, 32, 32, 32)  # 2x upsamplers
    else:
        assert out.shape == X_IN.shape
    assert bool(jnp.isfinite(out).all())


SHAPE_CHANGING = [
    (X.Conv2Mod(24, 3, 1), (2, 16, 16, 24)),
    (X.DSConv(24), (2, 16, 16, 24)),
    (X.LightConv(24, 3), (2, 16, 16, 24)),
    (X.RepConv(24, 3, 1), (2, 16, 16, 24)),
    (X.RepConv(24, 3, 2), (2, 8, 8, 24)),
    (X.ConvTranspose(24), (2, 32, 32, 24)),
    (X.RFAConv(24, 3, 1), (2, 16, 16, 24)),
    (X.GhostBottleneck(32, 3, 1), (2, 16, 16, 32)),
    (X.GhostBottleneck(24, 3, 2), (2, 8, 8, 24)),
    (X.C3Ghost(24, n=1), (2, 16, 16, 24)),
    (X.C3x(24, n=1), (2, 16, 16, 24)),
    (X.BottleneckCSP(24, n=1), (2, 16, 16, 24)),
    (X.RepNCSPELAN4(32, 32, 16, n=1), (2, 16, 16, 32)),
    (X.ADown(32), (2, 8, 8, 32)),
    (X.SC2f(32, n=2), (2, 16, 16, 32)),  # fork's template-bank C2f
    (X.ESC2f(32, n=2), (2, 16, 16, 32)),
    (X.ResNetLayer(16, s=1, is_first=True), (2, 4, 4, 16)),
    (X.ResNetLayer(8, s=2, n=2), (2, 8, 8, 32)),
    (X.RepC3(24, n=2), (2, 16, 16, 24)),
    (X.HGStem(16, 32), (2, 4, 4, 32)),
    (X.HGBlock(16, 32, n=3), (2, 16, 16, 32)),
    (X.HGBlock(16, 32, n=2, lightconv=True, shortcut=True), (2, 16, 16, 32)),
]


@pytest.mark.parametrize("mod,shape", SHAPE_CHANGING, ids=lambda m: getattr(type(m), "__name__", str(m)))
def test_shape_changing_modules(mod, shape):
    out = _run(mod)
    assert out.shape == shape
    assert bool(jnp.isfinite(out).all())


def test_gold_yolo_fusion_ops():
    p2 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 16))
    p3 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 32))
    p4 = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 64))
    p5 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 128))

    m3 = X.SimFusion3in(32, inc=(16, 32, 64))
    v = m3.init(jax.random.PRNGKey(4), [p2, p3, p4])
    assert m3.apply(v, [p2, p3, p4]).shape == (1, 16, 16, 32)

    m4 = X.SimFusion4in()
    out = m4.apply(m4.init(jax.random.PRNGKey(5), [p2, p3, p4, p5]), [p2, p3, p4, p5])
    assert out.shape == (1, 8, 8, 16 + 32 + 64 + 128)

    ap = X.AdvPoolFusion()
    out = ap.apply(ap.init(jax.random.PRNGKey(6), [p3, p4]), [p3, p4])
    assert out.shape == (1, 8, 8, 32 + 64)

    pp = X.PyramidPoolAgg(stride=2)
    out = pp.apply(pp.init(jax.random.PRNGKey(7), [p3, p4, p5]), [p3, p4, p5])
    assert out.shape == (1, 2, 2, 32 + 64 + 128)


def test_dynamic_scalseq_and_asf_attention():
    import jax.numpy as jnp

    from experiment_yolo_tpu.nn.modules import AsfAttention

    p3 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 32))
    p4 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64))
    p5 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 128))
    m = X.DynamicScalSeq(32, inc=(32, 64, 128))
    v = m.init(jax.random.PRNGKey(3), [p3, p4, p5])
    out = m.apply(v, [p3, p4, p5])
    assert out.shape == (1, 16, 16, 32)

    a = AsfAttention()
    b = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 32))
    va = a.init(jax.random.PRNGKey(5), [out, b])
    y = a.apply(va, [out, b])
    assert y.shape == (1, 16, 16, 32)
    assert bool(jnp.isfinite(y).all())


def test_dysample_zero_offset_is_near_nearest():
    """With zero offsets, DySample samples at output-cell centers — exact
    bilinear interp of the input; on a linear ramp it must reproduce it."""
    x = jnp.tile(jnp.arange(8.0)[None, :, None, None], (1, 1, 8, 1)).transpose(0, 1, 2, 3)
    mod = X.DySample(scale=2, groups=1)
    v = mod.init(RNG, x)
    # zero the offset conv (kernel init is ~0.001 anyway; force exact)
    v = jax.tree.map(lambda a: jnp.zeros_like(a), v)
    out = mod.apply(v, x)
    assert out.shape == (1, 16, 16, 1)
    # interior rows follow the half-step bilinear ramp of the input
    got = np.asarray(out[0, 2:14, 0, 0])
    expect = np.interp(np.arange(2, 14) / 2 + 0.25 - 0.5, np.arange(8), np.arange(8.0))
    np.testing.assert_allclose(got, expect, atol=0.3)


def test_yaml_registry_builds_graph_with_extra_modules(tmp_path):
    yaml_text = """
nc: 2
backbone:
  - [-1, 1, Conv, [16, 3, 2]]
  - [-1, 1, RepConv, [32, 3, 2]]
  - [-1, 1, C3Ghost, [32, True]]
  - [-1, 1, SEAttention, []]
  - [-1, 1, ADown, [64]]
  - [-1, 1, CBAM, []]
  - [-1, 1, SPPF, [64, 5]]
head:
  - [-1, 1, DySample, []]
  - [[-1, 2], 1, Concat, [1]]
  - [-1, 1, C3x, [32]]
  - [[9, 6], 1, Detect, [nc]]
"""
    p = tmp_path / "zoo.yaml"
    p.write_text(yaml_text)
    m = DetectionModel(str(p))
    assert m.strides == (4, 8)
    v = m.init(jax.random.PRNGKey(0))
    outs = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1:3] for o in outs] == [(16, 16), (8, 8)]


def test_attention_tranche2_shapes():
    """SpatialGroupEnhance/BAM/CPCA/MPCA/LSKA/SegNext/MLCA (attention.py
    tranche 2): channel-preserving forward + finite outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from experiment_yolo_tpu.nn import extra_modules as X

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 64).astype(np.float32))
    for mod in (
        X.SpatialGroupEnhance(),
        X.BAMBlock(),
        X.CPCA(),
        X.MPCA(),
        X.LSKA(k_size=11),
        X.SegNextAttention(),
        X.MLCA(64),
    ):
        v = mod.init(jax.random.PRNGKey(0), x, True)
        y = mod.apply(v, x, False, mutable=False) if "batch_stats" not in v else \
            mod.apply({"params": v["params"], "batch_stats": v["batch_stats"]}, x, False)
        assert y.shape == x.shape, type(mod).__name__
        assert np.isfinite(np.asarray(y)).all(), type(mod).__name__


def test_attention_tranche2_param_parity():
    """Param-count parity vs the reference attention classes."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    ref = Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(ref))
    import importlib

    A = importlib.import_module("ultralytics.nn.extra_modules.attention")
    from experiment_yolo_tpu.nn import extra_modules as X

    x = jnp.zeros((1, 8, 8, 64))
    cases = [
        (A.SpatialGroupEnhance(8), X.SpatialGroupEnhance()),
        (A.BAMBlock(64), X.BAMBlock()),
        (A.CPCA(64), X.CPCA()),
        (A.MPCA(64), X.MPCA()),
        (A.LSKA(64, 11), X.LSKA(k_size=11)),
        (A.SegNext_Attention(64), X.SegNextAttention()),
        (A.MLCA(64), X.MLCA(64)),
    ]
    for tm, om in cases:
        t = sum(p.numel() for p in tm.parameters())
        v = jax.eval_shape(lambda om=om: om.init(jax.random.PRNGKey(0), x, True))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{type(tm).__name__}: ours {o:,} vs reference {t:,}"
