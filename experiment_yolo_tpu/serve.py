"""Native TPU serving: an HTTP detection server with dynamic batching.

The deployment-side counterpart of the reference's serving surface (its
Triton client, utils/triton.py, assumes an external GPU server). On TPU the
natural design is one statically-shaped jitted program and a batching window
in front of it:

- the device program is compiled ONCE at (batch, imgsz) — every request is
  letterboxed on host and slotted into the next batch, short batches are
  zero-padded (shape-stable, no recompiles, XLA-friendly);
- a collector thread gathers requests for up to ``max_wait_ms`` or until the
  batch is full (classic dynamic batching: latency bound at low load, full
  MXU occupancy at high load);
- HTTP is stdlib ``ThreadingHTTPServer`` — no server dependencies, same
  stance as the C++ example consumer.

API:
  GET  /health            -> {"status": "ok", model, batch, imgsz, queue}
  POST /predict           body = raw JPEG/PNG bytes, or JSON
                          {"image": <base64>}; returns
                          {"detections": [{"box": [x1,y1,x2,y2], "conf": c,
                            "cls": k, "name": str}], "speed_ms": ...}

Usage::

    server = DetectionServer("yolov8n.yaml", batch=8, imgsz=640)
    server.start(port=8000)          # returns immediately (daemon threads)
    ...
    server.stop()
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from experiment_yolo_tpu.utils import LOGGER


class _Batcher:
    """Collects requests into static-shape batches for one jitted program."""

    def __init__(self, predictor, batch: int, max_wait_ms: float):
        self.predictor = predictor
        self.batch = batch
        self.max_wait = max_wait_ms / 1000.0
        self.q: "queue.Queue[tuple]" = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def submit(self, img: np.ndarray) -> Future:
        fut: Future = Future()
        self.q.put((img, fut))
        return fut

    def _collect(self) -> List[tuple]:
        try:
            first = self.q.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait
        while len(items) < self.batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                items.append(self.q.get(timeout=left))
            except queue.Empty:
                break
        return items

    def _loop(self) -> None:
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            imgs = [im for im, _ in items]
            try:
                t0 = time.perf_counter()
                results = self.predictor(imgs)
                dt = (time.perf_counter() - t0) * 1000
                for (_, fut), res in zip(items, results):
                    if not fut.cancelled():
                        fut.set_result((res, dt / len(items)))
            except Exception as e:  # fail every request of the batch, keep serving
                for _, fut in items:
                    if not fut.cancelled():
                        fut.set_exception(e)


class DetectionServer:
    """HTTP detection service over one statically-batched jitted program."""

    def __init__(self, model, batch: int = 8, imgsz: int = 640,
                 conf: float = 0.25, max_wait_ms: float = 10.0, **overrides):
        from experiment_yolo_tpu.engine.model import YOLO

        self.yolo = model if isinstance(model, YOLO) else YOLO(str(model))
        from experiment_yolo_tpu.engine.predictor import DetectionPredictor

        self.batch = batch
        self.imgsz = imgsz
        self.predictor = DetectionPredictor(
            self.yolo.model, self.yolo.variables,
            overrides={"batch": batch, "imgsz": imgsz, "conf": conf,
                       "verbose": False, **overrides},
        )
        self.batcher = _Batcher(self.predictor, batch, max_wait_ms)
        self.httpd: Optional[ThreadingHTTPServer] = None
        self._http_thread: Optional[threading.Thread] = None

    # -- lifecycle ----------------------------------------------------------
    def start(self, host: str = "127.0.0.1", port: int = 8000) -> int:
        """Start batching + HTTP threads; returns the bound port (0 = ephemeral)."""
        self.batcher.thread.start()
        self.warmup()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # route through our logger, quiet tests
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {
                        "status": "ok",
                        "model": getattr(server.yolo.model, "yaml", {}).get("yaml_file", "model"),
                        "batch": server.batch, "imgsz": server.imgsz,
                        "queue": server.batcher.q.qsize(),
                    })
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                if self.path != "/predict":
                    self._send(404, {"error": f"unknown path {self.path}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(n)
                    if self.headers.get("Content-Type", "").startswith("application/json"):
                        raw = base64.b64decode(json.loads(raw)["image"])
                    img = server._decode(raw)
                    self._send(200, server.predict_one(img))
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._http_thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._http_thread.start()
        bound = self.httpd.server_address[1]
        LOGGER.info(f"serve: listening on {host}:{bound} (batch={self.batch}, imgsz={self.imgsz})")
        return bound

    def stop(self) -> None:
        if self.httpd:
            self.httpd.shutdown()
            self.httpd.server_close()
        self.batcher._stop.set()

    def warmup(self) -> None:
        """Compile the device program before accepting traffic."""
        dummy = np.zeros((self.imgsz, self.imgsz, 3), np.uint8)
        self.predictor([dummy])

    # -- inference ----------------------------------------------------------
    @staticmethod
    def _decode(raw: bytes) -> np.ndarray:
        import cv2

        img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("could not decode image bytes")
        return img

    def predict_one(self, img: np.ndarray) -> dict:
        res, batch_ms = self.batcher.submit(img).result(timeout=60)
        names = res.names or {}
        dets = [
            {"box": [round(float(v), 2) for v in b.tolist()],
             "conf": round(float(c), 4), "cls": int(k),
             "name": str(names.get(int(k), int(k)))}
            for b, c, k in zip(res.boxes.xyxy, res.boxes.conf, res.boxes.cls)
        ]
        return {"detections": dets, "speed_ms": round(batch_ms, 2)}
