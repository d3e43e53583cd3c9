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
        # coalescing observability (served via /health): how many device
        # batches ran, total items, and the largest batch actually coalesced
        self.stats = {"batches": 0, "items": 0, "max_batch": 0}

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
            self.stats["batches"] += 1
            self.stats["items"] += len(items)
            self.stats["max_batch"] = max(self.stats["max_batch"], len(items))
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

        self.predictor = DetectionPredictor(
            self.yolo.model, self.yolo.variables,
            overrides={"batch": batch, "imgsz": imgsz, "conf": conf,
                       "verbose": False, **overrides},
        )
        # exported artifacts bake batch/imgsz — report and batch to the
        # shapes the device program actually runs
        self.batch = self.predictor.batch
        self.imgsz = self.predictor.imgsz
        self.batcher = _Batcher(self.predictor, self.batch, max_wait_ms)
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
                        "batching": dict(server.batcher.stats),
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
                except Exception as e:  # malformed request -> client error
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                try:
                    self._send(200, server.predict_one(img))
                except Exception as e:  # inference/device fault -> server error
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

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
        # fail queued requests immediately instead of leaving their handler
        # threads blocked until the Future timeout
        while True:
            try:
                _, fut = self.batcher.q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("server stopped"))

    def warmup(self) -> None:
        """Compile the device program before accepting traffic."""
        dummy = np.zeros((self.imgsz, self.imgsz, 3), np.uint8)
        self.predictor([dummy])

    # -- inference ----------------------------------------------------------
    @staticmethod
    def _decode(raw: bytes) -> np.ndarray:
        # cv2 first: libjpeg-turbo SIMD measures ~15% faster than the native
        # core for single in-memory decode (10.5 vs 12.0 ms on bus.jpg) and
        # releases the GIL too. The native C++ decoder (dataloader.cpp,
        # forged-dimension hardened) is the fallback for opencv-less deploys.
        try:
            import cv2

            img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if img is not None:
                return img
        except ImportError:
            pass
        from experiment_yolo_tpu.data.native_loader import decode_image_bytes

        arr = decode_image_bytes(raw)
        if arr is None:
            raise ValueError("could not decode image bytes")
        return arr[..., ::-1]  # native is RGB; pipeline contract is BGR

    def predict_one(self, img: np.ndarray) -> dict:
        res, batch_ms = self.batcher.submit(img).result(timeout=60)
        return {**serialize_results(res), "speed_ms": round(batch_ms, 2)}


def _rle(mask: np.ndarray) -> dict:
    """COCO-style uncompressed RLE (column-major counts, first run = zeros)."""
    flat = np.asarray(mask, bool).flatten(order="F")
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    counts = np.diff(np.concatenate([[0], change, [flat.size]])).tolist()
    if flat.size and flat[0]:  # counts must start with a zero-run
        counts = [0] + counts
    return {"size": [int(mask.shape[0]), int(mask.shape[1])], "counts": counts}


def serialize_results(res) -> dict:
    """Task-aware Results -> JSON-safe dict (boxes / masks RLE / keypoints /
    oriented boxes / classify probs)."""
    names = res.names or {}
    out: dict = {"detections": []}
    if res.probs is not None:  # classify
        p = res.probs
        out["probs"] = {
            "top1": {"cls": p.top1, "name": str(names.get(p.top1, p.top1)),
                     "conf": round(p.top1conf, 4)},
            "top5": [{"cls": int(k), "name": str(names.get(int(k), int(k))),
                      "conf": round(float(p.data[k]), 4)} for k in p.top5],
        }
        return out
    if res.obb is not None:  # oriented boxes
        out["detections"] = [
            {"xywhr": [round(float(v), 4) for v in xr.tolist()],
             "points": [[round(float(v), 2) for v in pt] for pt in pts.tolist()],
             "conf": round(float(c), 4), "cls": int(k),
             "name": str(names.get(int(k), int(k)))}
            for xr, pts, c, k in zip(res.obb.xywhr, res.obb.xyxyxyxy,
                                     res.obb.conf, res.obb.cls)
        ]
        return out
    if res.boxes is not None:
        for i, (b, c, k) in enumerate(zip(res.boxes.xyxy, res.boxes.conf, res.boxes.cls)):
            d = {"box": [round(float(v), 2) for v in b.tolist()],
                 "conf": round(float(c), 4), "cls": int(k),
                 "name": str(names.get(int(k), int(k)))}
            if res.masks is not None:
                d["mask_rle"] = _rle(res.masks.data[i])
            if res.keypoints is not None:
                d["keypoints"] = [[round(float(v), 2) for v in kp]
                                  for kp in res.keypoints.data[i].tolist()]
            out["detections"].append(d)
    return out
