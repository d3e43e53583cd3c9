"""ONNX export: jaxpr->ONNX compiler + self-contained protobuf writer
(VERDICT r2 item 6). No onnx/onnxruntime in this environment, so output
equality is verified with the independent pure-numpy interpreter in
export/onnx_runtime_np.py (conv = im2col numpy, no jax)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.export import onnx_proto as P
from experiment_yolo_tpu.export.onnx_export import export_jaxpr_to_onnx
from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx


def _roundtrip(fn, *args, atol=1e-4, names=None):
    closed = jax.make_jaxpr(fn)(*args)
    n_out = len(closed.jaxpr.outvars)
    out_names = [f"out{i}" for i in range(n_out)]
    in_names = names or [f"in{i}" for i in range(len(args))]
    blob = export_jaxpr_to_onnx(closed, in_names, out_names)
    feeds = {n: np.asarray(a) for n, a in zip(in_names, args)}
    got = run_onnx(blob, feeds)
    want = fn(*args)
    want = want if isinstance(want, (tuple, list)) else (want,)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=atol, rtol=1e-4)
    return blob


def test_proto_roundtrip_primitives():
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    t = P.tensor("w", arr)
    node = P.node("Conv", ["x", "w"], ["y"], name="n0", strides=[2, 2], group=1, alpha=0.5)
    vi_in = P.value_info("x", P.FLOAT, [1, 3, "H", 4])
    g = P.graph("g", [node], [vi_in], [P.value_info("y", P.FLOAT, [1])], [t])
    m = P.model(g, opset=17)
    parsed = P.parse_model(m)
    assert parsed["opset"] == 17
    assert parsed["producer"] == "experiment-yolo-tpu"
    gg = parsed["graph"]
    assert gg["name"] == "g"
    np.testing.assert_array_equal(gg["initializers"]["w"]["array"], arr)
    n = gg["nodes"][0]
    assert n["op_type"] == "Conv" and n["inputs"] == ["x", "w"] and n["outputs"] == ["y"]
    assert n["attrs"]["strides"] == [2, 2] and n["attrs"]["group"] == 1
    assert abs(n["attrs"]["alpha"] - 0.5) < 1e-7
    assert gg["inputs"][0]["dims"] == [1, 3, "H", 4]


def test_isfinite_rem_clamp_semantics():
    """Regression: is_finite must not lower to bare IsInf (inverted, NaN-wrong);
    rem needs Mod fmod=1 (dividend sign, float-legal); clamp with TENSOR
    bounds must avoid ONNX Clip's scalar-only min/max."""
    x = np.array([1.0, -np.inf, np.nan, 0.0, np.inf], np.float32)
    _roundtrip(lambda a: jnp.isfinite(a), x)

    a = np.array([-7.0, 7.0, -7.5, 7.5], np.float32)
    b = np.array([3.0, -3.0, 2.0, -2.0], np.float32)
    _roundtrip(lambda u, v: jax.lax.rem(u, v), a, b)  # sign of dividend

    lo = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    hi = np.array([2.0, 3.0, 4.0, 5.0], np.float32)
    v = np.array([-1.0, 2.5, 9.0, 4.0], np.float32)
    blob = _roundtrip(lambda vv: jnp.clip(vv, lo, hi), v)
    ops = [n["op_type"] for n in P.parse_model(blob)["graph"]["nodes"]]
    assert "Clip" not in ops  # tensor bounds -> Max/Min chain


def test_elementwise_and_reduce():
    def fn(a, b):
        c = jnp.exp(a) * jax.nn.sigmoid(b) + jnp.maximum(a, b)
        return c.sum(axis=1), c.max()

    a = jnp.asarray(np.random.RandomState(0).randn(4, 5).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(1).randn(4, 5).astype(np.float32))
    _roundtrip(fn, a, b)


def test_conv_maxpool_concat_upsample():
    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.1)

    def fn(x):
        y = jax.lax.conv_general_dilated(
            x, w1, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.silu(y)
        p = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                                  ((0, 0), (1, 1), (1, 1), (0, 0)))
        up = jnp.repeat(jnp.repeat(p, 2, axis=1), 2, axis=2)[:, : y.shape[1], : y.shape[2]]
        return jnp.concatenate([y, up], axis=-1)

    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    _roundtrip(fn, x)


def test_grouped_conv_and_matmul():
    rng = np.random.RandomState(0)
    wd = jnp.asarray(rng.randn(3, 3, 1, 8).astype(np.float32) * 0.2)  # depthwise
    wm = jnp.asarray(rng.randn(8, 6).astype(np.float32) * 0.2)

    def fn(x):
        y = jax.lax.conv_general_dilated(
            x, wd, (1, 1), ((1, 1), (1, 1)), feature_group_count=8,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.einsum("bhwc,cd->bhwd", y, wm)

    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    _roundtrip(fn, x)


def test_softmax_slice_iota_cast():
    def fn(x):
        s = jax.nn.softmax(x[:, 2:14:3], axis=-1)
        proj = jnp.arange(s.shape[-1], dtype=jnp.float32)
        e = (s * proj).sum(-1)
        return e.astype(jnp.float32), jnp.where(e > 0.5, e, -e)

    x = jnp.asarray(np.random.RandomState(0).randn(3, 16, 4).astype(np.float32))
    _roundtrip(fn, x)


@pytest.mark.slow
def test_yolov8n_onnx_output_equality(tmp_path):
    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0))
    ex = Exporter(m, v, imgsz=160, batch=1)
    p = ex("onnx", tmp_path / "y8n")
    assert p.suffix == ".onnx" and p.stat().st_size > 1e6
    blob = p.read_bytes()

    parsed = P.parse_model(blob)
    g = parsed["graph"]
    # graph well-formed: every node input is a prior output/initializer/input
    known = set(g["initializers"]) | {vi["name"] for vi in g["inputs"]}
    for n in g["nodes"]:
        for i in n["inputs"]:
            assert i in known, f"dangling input {i} of {n['op_type']}"
        known.update(n["outputs"])
    for vi in g["outputs"]:
        assert vi["name"] in known

    x = np.random.RandomState(0).randint(0, 255, (1, 160, 160, 3), np.uint8)
    got = run_onnx(blob, {"images": x})
    want_b, want_s = jax.jit(ex._predict_fn())(jnp.asarray(x))
    np.testing.assert_allclose(got[0], np.asarray(want_b), atol=2e-3)
    np.testing.assert_allclose(got[1], np.asarray(want_s), atol=1e-5)


@pytest.mark.slow
def test_deal_flagship_onnx(tmp_path):
    from experiment_yolo_tpu.engine.exporter import Exporter
    from experiment_yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8-ASF-P2P2.yaml")
    v = m.init(jax.random.PRNGKey(0))
    ex = Exporter(m, v, imgsz=128, batch=1)
    p = ex("onnx", tmp_path / "deal")
    x = np.random.RandomState(1).randint(0, 255, (1, 128, 128, 3), np.uint8)
    got = run_onnx(p.read_bytes(), {"images": x})
    want_b, want_s = jax.jit(ex._predict_fn())(jnp.asarray(x))
    np.testing.assert_allclose(got[0], np.asarray(want_b), atol=2e-3)
    np.testing.assert_allclose(got[1], np.asarray(want_s), atol=1e-5)
