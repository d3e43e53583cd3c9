"""Export tests: StableHLO round-trip (+ SavedModel/TFLite smoke if TF works)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experiment_yolo_tpu.engine.exporter import Exporter, load_stablehlo
from experiment_yolo_tpu.nn.tasks import DetectionModel

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def setup():
    model = DetectionModel(TINY)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def test_stablehlo_roundtrip(setup, tmp_path):
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("stablehlo", tmp_path / "tiny")
    assert p.exists() and p.stat().st_size > 1000

    fn = load_stablehlo(p)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    boxes, scores = fn(jnp.asarray(img))
    # must equal the live model's output
    ref_boxes, ref_scores = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes), atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-5)


def test_tflite_export_runs(setup, tmp_path):
    tf = pytest.importorskip("tensorflow")
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("tflite", tmp_path / "tiny")
    assert p.exists() and p.stat().st_size > 1000
    # run the flatbuffer through the TFLite interpreter
    interp = tf.lite.Interpreter(model_path=str(p))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    interp.set_tensor(inp["index"], img)
    interp.invoke()
    outs = [interp.get_tensor(o["index"]) for o in interp.get_output_details()]
    shapes = sorted(tuple(o.shape) for o in outs)
    assert shapes == sorted([(1, 80, 4), (1, 80, 3)])  # 8x8 + 4x4 anchors, nc=3


def test_tflite_int8_quantized(setup, tmp_path):
    """int8 PTQ (reference exporter int8=True): calibrated flatbuffer runs,
    is smaller than fp32, and outputs correlate with the live model."""
    tf = pytest.importorskip("tensorflow")
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    rng = np.random.RandomState(1)
    calib = [rng.randint(0, 255, (1, 64, 64, 3), np.uint8) for _ in range(8)]
    p32 = ex("tflite", tmp_path / "tiny_f32")
    p8 = ex("tflite", tmp_path / "tiny_i8", int8=True, data=calib)
    assert p8.exists() and p8.stat().st_size < p32.stat().st_size

    interp = tf.lite.Interpreter(model_path=str(p8))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    assert inp["dtype"] == np.uint8  # reference int8 artifacts keep uint8 input
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    interp.set_tensor(inp["index"], img)
    interp.invoke()
    outs = {tuple(o["shape"]): interp.get_tensor(o["index"])
            for o in interp.get_output_details()}
    boxes_q = outs[(1, 80, 4)].astype(np.float32)
    ref_boxes, _ = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    ref_boxes = np.asarray(ref_boxes, np.float32)
    # quantized: expect agreement in the large (boxes live in [0, 64] px)
    corr = np.corrcoef(boxes_q.ravel(), ref_boxes.ravel())[0, 1]
    assert corr > 0.9, corr


def test_tflite_half(setup, tmp_path):
    pytest.importorskip("tensorflow")
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p32 = ex("tflite", tmp_path / "tiny_f32b")
    p16 = ex("tflite", tmp_path / "tiny_f16", half=True)
    assert p16.exists() and p16.stat().st_size < p32.stat().st_size


@pytest.mark.parametrize("yaml_name,n_out", [
    ("tiny-seg.yaml", 4),   # boxes, scores, coeffs, protos
    ("tiny-pose.yaml", 3),  # boxes, scores, kpts
    ("tiny-obb.yaml", 2),   # rboxes, scores
])
def test_task_model_export_roundtrip(yaml_name, n_out, tmp_path):
    """Seg/pose/obb exports (reference exporter covers all task heads;
    e.g. examples/YOLOv8-Segmentation-ONNXRuntime-Python consumes a seg
    ONNX): StableHLO artifact must reproduce the live model's outputs."""
    from experiment_yolo_tpu.nn.tasks import OBBModel, PoseModel, SegmentationModel

    cls = {"tiny-seg.yaml": SegmentationModel, "tiny-pose.yaml": PoseModel,
           "tiny-obb.yaml": OBBModel}[yaml_name]
    model = cls(str(Path(__file__).parent / "assets" / yaml_name))
    variables = model.init(jax.random.PRNGKey(0))
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("stablehlo", tmp_path / yaml_name.replace(".yaml", ""))
    fn = load_stablehlo(p)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    got = fn(jnp.asarray(img))
    want = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    assert len(got) == n_out == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


def test_segment_onnx_export(tmp_path):
    """Seg ONNX artifact: named outputs + output equality via the
    independent numpy ONNX interpreter."""
    from experiment_yolo_tpu.export.onnx_proto import parse_model
    from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx
    from experiment_yolo_tpu.nn.tasks import SegmentationModel

    model = SegmentationModel(str(Path(__file__).parent / "assets" / "tiny-seg.yaml"))
    variables = model.init(jax.random.PRNGKey(0))
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("onnx", tmp_path / "tiny_seg")
    blob = p.read_bytes()
    outs = [o["name"] for o in parse_model(blob)["graph"]["outputs"]]
    assert outs == ["boxes", "scores", "coeffs", "protos"]
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    got = run_onnx(blob, {"images": img})
    want = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=1e-3, rtol=1e-3)


def test_classify_onnx_export(tmp_path):
    """Classify ONNX: single 'probs' output, equality via numpy interpreter."""
    from experiment_yolo_tpu.export.onnx_proto import parse_model
    from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx
    from experiment_yolo_tpu.models.classify import ClassificationModel

    model = ClassificationModel(str(Path(__file__).parent / "assets" / "tiny.yaml"), nc=5)
    variables = model.init(jax.random.PRNGKey(0))
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("onnx", tmp_path / "tiny_cls")
    blob = p.read_bytes()
    outs = [o["name"] for o in parse_model(blob)["graph"]["outputs"]]
    assert outs == ["probs"]
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    got = run_onnx(blob, {"images": img})
    want = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(got[0], np.asarray(want), atol=1e-3, rtol=1e-3)


def test_unknown_format_raises(setup, tmp_path):
    model, variables = setup
    with pytest.raises(ValueError):
        Exporter(model, variables)("coreml", tmp_path / "x")


def test_onnx_rtdetr_primitives_roundtrip():
    """The primitives RT-DETR's decode path adds (square, reduce_and, top_k,
    take_along_axis/GatherND, sin/cos) export and run through the numpy
    interpreter with exact agreement."""
    from experiment_yolo_tpu.export.onnx_export import export_jaxpr_to_onnx
    from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx

    def fn(x, idx):
        a = jnp.square(x)                                   # square
        anyrow = jnp.all(x > 0.1, axis=-1)                  # reduce_and
        vals, ti = jax.lax.top_k(a.sum(-1), 3)              # top_k (2 outputs)
        g = jnp.take_along_axis(x, ti[..., None], axis=1)   # pointwise gather
        s = jnp.sin(vals) + jnp.cos(vals)                   # sin/cos
        return a, anyrow, vals, ti, g, s

    x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (2, 8, 4)), jnp.float32)
    idx = jnp.zeros((2, 3), jnp.int32)
    closed = jax.make_jaxpr(fn)(x, idx)
    blob = export_jaxpr_to_onnx(closed, ["x", "idx"], [f"o{i}" for i in range(6)])
    got = run_onnx(blob, {"x": np.asarray(x), "idx": np.asarray(idx)})
    want = fn(x, idx)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32), np.asarray(w, np.float32),
                                   atol=1e-6, rtol=1e-6)


def test_rtdetr_onnx_export_roundtrip(tmp_path):
    """RT-DETR family through ONNX (reference exports rtdetr to ONNX): the
    tiny config exercises AIFI-free deformable decode — top-k query select,
    dynamic-start slice, batched take_along_axis (GatherElements), bilinear
    deform-attn sampling. Verified at full scale offline: rtdetr.yaml
    (42.77M) exports and the numpy interpreter matches within 3e-4."""
    from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx

    model = DetectionModel(str(Path(__file__).parent / "assets" / "tiny-rtdetr.yaml"))
    assert model.head_type == "RTDETRDecoder"
    variables = model.init(jax.random.PRNGKey(0))
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("onnx", tmp_path / "tiny_rtdetr")
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    got = run_onnx(p.read_bytes(), {"images": img})
    want = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("yaml_name,cls_name,n_out", [
    ("tiny-pose.yaml", "PoseModel", 3),
    ("tiny-obb.yaml", "OBBModel", 2),
])
def test_pose_obb_onnx_export(yaml_name, cls_name, n_out, tmp_path):
    """Pose/OBB ONNX artifacts match the live model via the numpy
    interpreter (completes ONNX coverage of every task head)."""
    import experiment_yolo_tpu.nn.tasks as tasks
    from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx

    model = getattr(tasks, cls_name)(str(Path(__file__).parent / "assets" / yaml_name))
    variables = model.init(jax.random.PRNGKey(0))
    p = Exporter(model, variables, imgsz=64, batch=1)("onnx", tmp_path / "m")
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    got = run_onnx(p.read_bytes(), {"images": img})
    want = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    assert len(got) == n_out
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=1e-3, rtol=1e-3)


def test_pb_export_roundtrip(setup, tmp_path):
    """Frozen GraphDef export (reference exporter.py:91 'pb' row) loads back
    through AutoBackend and matches the live model."""
    pytest.importorskip("tensorflow")
    from experiment_yolo_tpu.nn.autobackend import AutoBackend

    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    p = ex("pb", tmp_path / "tiny")
    assert p.exists() and p.stat().st_size > 1000
    ab = AutoBackend(str(p))
    assert ab.format == "pb" and ab.input_shape == (1, 64, 64, 3)
    img = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3), np.uint8)
    boxes, scores = ab.forward(img)
    rb, rs = model.predict(variables, jnp.asarray(img).astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(boxes, np.asarray(rb), atol=1e-3)
    np.testing.assert_allclose(scores, np.asarray(rs), atol=1e-4)


def test_tfjs_and_edgetpu_gated(setup, tmp_path):
    """tfjs/edgetpu need tools absent from this image: the convertible half
    is written and the error names the missing tool (reference hard-requires
    tensorflowjs / edgetpu_compiler the same way)."""
    pytest.importorskip("tensorflow")
    model, variables = setup
    ex = Exporter(model, variables, imgsz=64, batch=1)
    with pytest.raises(ImportError, match="tensorflowjs"):
        ex("tfjs", tmp_path / "tiny_tfjs")
    assert (tmp_path / "tiny_tfjs_saved_model" / "saved_model.pb").exists()
    with pytest.raises(RuntimeError, match="edgetpu_compiler"):
        ex("edgetpu", tmp_path / "tiny_edge", data=[
            np.random.RandomState(i).randint(0, 255, (1, 64, 64, 3), np.uint8)
            for i in range(4)
        ])
    assert (tmp_path / "tiny_edge_int8.tflite").exists()
