"""HTTP serving with dynamic batching (experiment_yolo_tpu/serve.py)."""

import base64
import json
import threading
import urllib.request
from pathlib import Path

import cv2
import numpy as np
import pytest

from experiment_yolo_tpu.serve import DetectionServer

TINY = str(Path(__file__).parent / "assets" / "tiny.yaml")


@pytest.fixture(scope="module")
def server():
    s = DetectionServer(TINY, batch=4, imgsz=64, conf=1e-4, max_wait_ms=30)
    port = s.start(port=0)
    yield s, port
    s.stop()


def _jpeg(seed: int) -> bytes:
    img = np.random.RandomState(seed).randint(0, 255, (60, 80, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def _post(port: int, data: bytes, ctype: str = "image/jpeg"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=data, headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health(server):
    _, port = server
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["batch"] == 4 and h["imgsz"] == 64


def test_predict_raw_and_base64(server):
    _, port = server
    out = _post(port, _jpeg(0))
    assert "detections" in out and isinstance(out["detections"], list)
    for d in out["detections"]:
        assert len(d["box"]) == 4 and 0.0 <= d["conf"] <= 1.0 and "name" in d
    b64 = json.dumps({"image": base64.b64encode(_jpeg(1)).decode()}).encode()
    out2 = _post(port, b64, ctype="application/json")
    assert "detections" in out2


def test_concurrent_requests_batched(server):
    _, port = server
    outs = [None] * 6
    errs = []

    def hit(i):
        try:
            outs[i] = _post(port, _jpeg(100 + i))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errs and all(o is not None and "detections" in o for o in outs)


def test_batching_window_coalesces():
    """The dynamic-batching window must actually coalesce concurrent
    requests into one device batch (VERDICT r3 item 6): with a generous
    window, N submits inside it run as a single batch — observable through
    the batcher's stats, which /health also reports."""
    s = DetectionServer(TINY, batch=4, imgsz=64, conf=1e-4, max_wait_ms=500)
    port = s.start(port=0)
    try:
        img = np.random.RandomState(0).randint(0, 255, (60, 80, 3), np.uint8)
        futs = [s.batcher.submit(img) for _ in range(4)]
        for f in futs:
            f.result(timeout=120)
        assert s.batcher.stats["max_batch"] >= 2, s.batcher.stats
        assert s.batcher.stats["items"] >= 4
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as r:
            h = json.loads(r.read())
        assert h["batching"]["max_batch"] >= 2
    finally:
        s.stop()


def test_bad_requests(server):
    _, port = server
    req = urllib.request.Request(f"http://127.0.0.1:{port}/predict", data=b"not an image")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei2:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
    assert ei2.value.code == 404


def test_task_aware_serialization():
    """segment/pose results serialize masks as COCO RLE and keypoints."""
    import jax

    import experiment_yolo_tpu.nn.tasks as tasks
    from experiment_yolo_tpu.engine.predictor import DetectionPredictor
    from experiment_yolo_tpu.serve import _rle, serialize_results

    img = np.random.RandomState(5).randint(0, 255, (48, 96, 3), np.uint8)
    for cls_name, yaml_name, field in (
        ("SegmentationModel", "tiny-seg.yaml", "mask_rle"),
        ("PoseModel", "tiny-pose.yaml", "keypoints"),
    ):
        model = getattr(tasks, cls_name)(str(Path(__file__).parent / "assets" / yaml_name))
        variables = model.init(jax.random.PRNGKey(0))
        res = DetectionPredictor(model, variables, overrides={"imgsz": 64, "conf": 1e-4})(img)[0]
        out = serialize_results(res)
        assert all(field in d for d in out["detections"])
    # RLE roundtrip: decode(encode(m)) == m
    m = np.random.RandomState(0).rand(13, 17) > 0.5
    r = _rle(m)
    decoded = np.zeros(13 * 17, bool)
    pos, val = 0, False
    for c in r["counts"]:
        decoded[pos:pos + c] = val
        pos += c
        val = not val
    np.testing.assert_array_equal(decoded.reshape(17, 13).T, m)


def test_serve_exported_onnx_artifact(tmp_path):
    """The server also fronts exported artifacts (AutoBackend host forward):
    the deployment story is train -> export -> serve, all one toolchain."""
    from experiment_yolo_tpu.engine.model import YOLO

    m = YOLO(TINY)
    p = m.export("onnx", tmp_path / "tiny_srv", imgsz=64, batch=1)
    s = DetectionServer(str(p), conf=1e-4, max_wait_ms=5)
    assert s.predictor.imgsz == 64 and s.predictor.batch == 1  # baked shapes adopted
    port = s.start(port=0)
    try:
        out = _post(port, _jpeg(3))
        assert "detections" in out
    finally:
        s.stop()


def test_deterministic_vs_direct_predict(server):
    """A served detection equals the same image through the direct predictor."""
    s, port = server
    img_bytes = _jpeg(7)
    out = _post(port, img_bytes)
    img = cv2.imdecode(np.frombuffer(img_bytes, np.uint8), cv2.IMREAD_COLOR)
    res = s.predictor([img])[0]
    assert len(out["detections"]) == len(res.boxes)
    if len(res.boxes):
        np.testing.assert_allclose(
            np.array([d["box"] for d in out["detections"]]),
            np.asarray(res.boxes.xyxy), atol=0.01)
