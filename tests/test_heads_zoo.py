"""Head zoo tranche: LSCD family, SEAM heads, Segment_Efficient —
shape contracts, full-model builds per task, and param parity vs the
reference (extra_modules/head.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = Path("/root/reference")

V8_HEAD_TMPL = """
nc: 3
backbone:
  - [-1, 1, Conv, [32, 3, 2]]
  - [-1, 1, Conv, [64, 3, 2]]
  - [-1, 1, Conv, [{c3}, 3, 2]]   # 2 P3/8
  - [-1, 1, Conv, [{c45}, 3, 2]]  # 3 P4/16
  - [-1, 1, Conv, [{c45}, 3, 2]]  # 4 P5/32
head:
  - [[2, 3, 4], 1, {head}, {args}]
"""


def _build(tmp_path, head, args):
    from experiment_yolo_tpu.nn.tasks import TASK_MODELS, guess_model_task, yaml_model_load

    yaml = tmp_path / f"{head}.yaml"
    # TADDH's shared tower requires equal channels (== hidc) on every level
    c3, c45 = (64, 64) if "TADDH" in head else (64, 128)
    yaml.write_text(V8_HEAD_TMPL.format(head=head, args=args, c3=c3, c45=c45))
    cfg = yaml_model_load(yaml)
    task = guess_model_task(cfg)
    model = TASK_MODELS[task](cfg)
    return model, task


@pytest.mark.parametrize(
    "head,args,task",
    [
        ("Detect_LSCD", "[nc, 64]", "detect"),
        ("Detect_SEAM", "[nc]", "detect"),
        ("Detect_MultiSEAM", "[nc]", "detect"),
        ("Segment_LSCD", "[nc, 16, 64, 64]", "segment"),
        ("Pose_LSCD", "[nc, [5, 3], 64]", "pose"),
        ("OBB_LSCD", "[nc, 1, 64]", "obb"),
        ("Segment_Efficient", "[nc, 16, 64]", "segment"),
        ("Detect_LADH", "[nc]", "detect"),
        ("Segment_LADH", "[nc, 16, 64]", "segment"),
        ("Pose_LADH", "[nc, [5, 3]]", "pose"),
        ("OBB_LADH", "[nc, 1]", "obb"),
        ("Detect_TADDH", "[nc, 64]", "detect"),
        ("Segment_TADDH", "[nc, 16, 64, 64]", "segment"),
        ("Pose_TADDH", "[nc, [5, 3], 64]", "pose"),
        ("OBB_TADDH", "[nc, 1, 64]", "obb"),
        ("Detect_DyHead", "[nc, 64, 1]", "detect"),
        ("Detect_AFPN_P345", "[nc, 64]", "detect"),
        ("Detect_AFPN_P345_Custom", "[nc, 64]", "detect"),
    ],
)
def test_head_builds_and_predicts(tmp_path, head, args, task):
    model, guessed = _build(tmp_path, head, args)
    assert guessed == task
    assert model.strides == (8, 16, 32)
    variables = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    out = model.predict(variables, x)
    boxes, scores = out[0], out[1]
    assert scores.shape[-1] == 3
    assert np.isfinite(np.asarray(boxes)).all()
    # train-mode forward produces the loss-ready structure
    feats, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    det = feats[0] if isinstance(feats, tuple) else feats
    assert len(det) == 3


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
@pytest.mark.parametrize(
    "name,kw",
    [
        ("Detect_LSCD", dict(nc=3, hidc=64, ch=(64, 128, 128))),
        ("Detect_SEAM", dict(nc=3, ch=(64, 128, 128))),
        ("Detect_MultiSEAM", dict(nc=3, ch=(64, 128, 128))),
        ("Segment_LSCD", dict(nc=3, nm=16, npr=64, hidc=64, ch=(64, 128, 128))),
        ("Pose_LSCD", dict(nc=3, kpt_shape=(5, 3), hidc=64, ch=(64, 128, 128))),
        ("OBB_LSCD", dict(nc=3, ne=1, hidc=64, ch=(64, 128, 128))),
        ("Segment_Efficient", dict(nc=3, nm=16, npr=64, ch=(64, 128, 128))),
        ("Detect_LADH", dict(nc=3, ch=(64, 128, 128))),
        ("Segment_LADH", dict(nc=3, nm=16, npr=64, ch=(64, 128, 128))),
        ("Pose_LADH", dict(nc=3, kpt_shape=(5, 3), ch=(64, 128, 128))),
        ("OBB_LADH", dict(nc=3, ne=1, ch=(64, 128, 128))),
        ("Detect_DyHead", dict(nc=3, hidc=64, block_num=1, ch=(64, 128, 128))),
        ("Detect_DyHeadWithDCNV3", dict(nc=3, hidc=64, block_num=1, ch=(64, 128, 128))),
        ("Detect_DyHead_Prune", dict(nc=3, hidc=64, block_num=1, ch=(64, 128, 128))),
        ("Detect_AFPN_P345", dict(nc=3, hidc=64, ch=(64, 128, 128))),
    ],
)
def test_param_count_parity(name, kw):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    head_mod = importlib.import_module("ultralytics.nn.extra_modules.head")
    tm = getattr(head_mod, name)(**kw)
    # drop the fixed DFL arange convs (buffers on our side)
    t_params = sum(p.numel() for nm, p in tm.named_parameters() if ".dfl" not in nm and not nm.startswith("dfl"))

    from experiment_yolo_tpu.nn import heads_extra as H

    ours = {
        "Detect_LADH": lambda: H.DetectLADH(nc=3, ch=(64, 128, 128)),
        "Detect_DyHead": lambda: H.DetectDyHead(nc=3, hidc=64, block_num=1, ch=(64, 128, 128)),
        "Detect_DyHeadWithDCNV3": lambda: H.DetectDyHead(nc=3, hidc=64, block_num=1, ch=(64, 128, 128), block="dcnv3"),
        "Detect_DyHead_Prune": lambda: H.DetectDyHead(nc=3, hidc=64, block_num=1, ch=(64, 128, 128), block="prune"),
        "Detect_AFPN_P345": lambda: H.DetectAFPN(nc=3, hidc=64, ch=(64, 128, 128)),
        "Segment_LADH": lambda: H.SegmentLADH(nc=3, nm=16, npr=64, ch=(64, 128, 128)),
        "Pose_LADH": lambda: H.PoseLADH(nc=3, kpt_shape=(5, 3), ch=(64, 128, 128)),
        "OBB_LADH": lambda: H.OBBLADH(nc=3, ne=1, ch=(64, 128, 128)),
        "Detect_LSCD": lambda: H.DetectLSCD(nc=3, hidc=64, ch=(64, 128, 128)),
        "Detect_SEAM": lambda: H.DetectSEAM(nc=3, ch=(64, 128, 128)),
        "Detect_MultiSEAM": lambda: H.DetectSEAM(nc=3, ch=(64, 128, 128), multi=True),
        "Segment_LSCD": lambda: H.SegmentLSCD(nc=3, nm=16, npr=64, hidc=64, ch=(64, 128, 128)),
        "Pose_LSCD": lambda: H.PoseLSCD(nc=3, kpt_shape=(5, 3), hidc=64, ch=(64, 128, 128)),
        "OBB_LSCD": lambda: H.OBBLSCD(nc=3, ne=1, hidc=64, ch=(64, 128, 128)),
        "Segment_Efficient": lambda: H.SegmentEfficient(nc=3, nm=16, npr=64, ch=(64, 128, 128)),
    }[name]()
    xs = [jnp.zeros((1, 16 // (2**i), 16 // (2**i), c)) for i, c in enumerate((64, 128, 128))]
    v = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), xs, False))
    o_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert o_params == t_params, f"{name}: ours {o_params:,} vs reference {t_params:,}"


def test_dyhead_dcnv4_and_hgblock_variants():
    """DCNv4 DyHead (reference needs the absent DCNv4 package — run ours) and
    the Ghost/Rep/Dynamic HGBlock variants (extra block.py:2846-2933)."""
    from experiment_yolo_tpu.nn import heads_extra as H
    from experiment_yolo_tpu.nn.extra_modules import HGBlock

    xs = [jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 64))]
    om = H.DetectDyHead(nc=3, hidc=64, block_num=1, ch=(64, 64, 64), block="dcnv4")
    v = om.init(jax.random.PRNGKey(0), xs, False)
    y = om.apply(v, xs, False)
    assert [o.shape[-1] for o in y] == [67, 67, 67]

    x = jnp.zeros((1, 16, 16, 64))
    for variant in ("ghost", "rep", "dynamic"):
        m = HGBlock(32, 64, 3, 6, True, variant=variant)
        vv = m.init(jax.random.PRNGKey(0), x, False)
        assert m.apply(vv, x, False).shape == (1, 16, 16, 64), variant


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_hgblock_variant_param_parity():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    block = importlib.import_module("ultralytics.nn.extra_modules.block")
    from experiment_yolo_tpu.nn.extra_modules import HGBlock

    x = jnp.zeros((1, 16, 16, 64))
    for name, variant in [("Ghost_HGBlock", "ghost"), ("Rep_HGBlock", "rep"),
                          ("Dynamic_HGBlock", "dynamic")]:
        tm = getattr(block, name)(64, 32, 64, 3, 6, True)
        t = sum(p.numel() for p in tm.parameters())
        om = HGBlock(32, 64, 3, 6, True, variant=variant)
        v = jax.eval_shape(lambda om=om: om.init(jax.random.PRNGKey(0), x, False))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert t == o, f"{name}: ours {o:,} vs reference {t:,}"


@pytest.mark.slow
@pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")
def test_afpn_p2345_param_parity():
    """Detect_AFPN_P2345(_Custom) (extra head.py:151/163): 4-level AFPN."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools" / "refstub"))
    sys.path.insert(0, str(REF))
    import importlib

    head_mod = importlib.import_module("ultralytics.nn.extra_modules.head")
    from experiment_yolo_tpu.nn import heads_extra as H

    xs = [jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), 64)) for i in range(4)]
    for name, kw, om in [
        ("Detect_AFPN_P2345", dict(nc=3, hidc=64, ch=(64, 64, 64, 64)),
         H.DetectAFPN(nc=3, hidc=64, ch=(64, 64, 64, 64))),
        ("Detect_AFPN_P2345_Custom", dict(nc=3, hidc=64, block_type="C2f", ch=(64, 64, 64, 64)),
         H.DetectAFPN(nc=3, hidc=64, ch=(64, 64, 64, 64), custom=True)),
    ]:
        tm = getattr(head_mod, name)(**kw)
        t = sum(p.numel() for nm, p in tm.named_parameters() if ".dfl" not in nm and not nm.startswith("dfl"))
        v = jax.eval_shape(lambda om=om: om.init(jax.random.PRNGKey(0), xs, False))
        o = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert o == t, f"{name}: ours {o:,} vs reference {t:,}"


def test_afpn_p2345_runs():
    from experiment_yolo_tpu.nn import heads_extra as H

    xs = [jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), 64)) for i in range(4)]
    m = H.DetectAFPN(nc=3, hidc=64, ch=(64, 64, 64, 64))
    v = m.init(jax.random.PRNGKey(0), xs, False)
    y = m.apply(v, xs, False)
    assert len(y) == 4 and all(o.shape[-1] == 67 for o in y)
