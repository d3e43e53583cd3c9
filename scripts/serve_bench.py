"""Serving load benchmark — drive DetectionServer with concurrent clients.

VERDICT r3 item 6: the serve path is this framework's deployment story and
had zero measurements. This script starts the server in-process, fires K
concurrent HTTP clients for a fixed duration, and reports:

- p50 / p90 / p99 end-to-end latency (client-observed, incl. HTTP + decode
  + letterbox + batching window + device + serialize),
- saturation throughput (completed requests / wall time),
- the batching window's coalescing stats (batches run, mean/max batch) —
  proof the dynamic batcher actually forms multi-image device batches
  under load rather than degenerating to batch-1.

Counterpart measurement to the reference's Triton deployment story
(reference ultralytics/utils/triton.py — client only; the server there is
external GPU infrastructure, so the reference never publishes serving
numbers).

Usage:
    python scripts/serve_bench.py [model=yolov8n.yaml] [imgsz=640] [batch=8]
                                  [clients=32] [seconds=30] [wait_ms=8]
                                  [conf=0.25]

Prints one JSON line with the numbers (plus per-phase breakdown on stderr).
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def parse_kv(argv):
    out = {}
    for a in argv:
        k, _, v = a.partition("=")
        out[k] = v
    return out


def make_jpegs(n: int, seed: int = 0):
    """Realistic-size JPEG payloads (textured noise + shapes, ~VGA)."""
    import cv2

    payloads = []
    rng = np.random.RandomState(seed)
    for _ in range(n):
        img = rng.randint(0, 80, (480, 640, 3), np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 0)
        for _ in range(6):
            c = tuple(int(v) for v in rng.randint(100, 255, 3))
            cv2.circle(img, (int(rng.randint(40, 600)), int(rng.randint(40, 440))),
                       int(rng.randint(10, 60)), c, -1)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        payloads.append(buf.tobytes())
    return payloads


def main(argv) -> None:
    kv = parse_kv(argv)
    model = kv.get("model", "yolov8n.yaml")
    imgsz = int(kv.get("imgsz", 640))
    batch = int(kv.get("batch", 8))
    clients = int(kv.get("clients", 32))
    seconds = float(kv.get("seconds", 30))
    wait_ms = float(kv.get("wait_ms", 8))
    conf = float(kv.get("conf", 0.25))

    from experiment_yolo_tpu.serve import DetectionServer

    server = DetectionServer(model, batch=batch, imgsz=imgsz, conf=conf,
                             max_wait_ms=wait_ms)
    port = server.start(port=0)
    url = f"http://127.0.0.1:{port}/predict"
    payloads = make_jpegs(16)

    latencies: list = []
    errors = [0]
    lock = threading.Lock()
    stop_at = [0.0]

    def client(i: int) -> None:
        k = 0
        while time.monotonic() < stop_at[0]:
            data = payloads[(i + k) % len(payloads)]
            k += 1
            t0 = time.monotonic()
            try:
                req = urllib.request.Request(
                    url, data=data, headers={"Content-Type": "image/jpeg"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
                dt = time.monotonic() - t0
                with lock:
                    latencies.append(dt)
            except Exception as e:
                with lock:
                    errors[0] += 1
                print(f"client error: {type(e).__name__}: {e}", file=sys.stderr)

    # warm the full HTTP path once before timing
    req = urllib.request.Request(url, data=payloads[0],
                                 headers={"Content-Type": "image/jpeg"})
    urllib.request.urlopen(req, timeout=300).read()
    base_stats = dict(server.batcher.stats)

    stop_at[0] = time.monotonic() + seconds
    t_start = time.monotonic()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    stats = {k: server.batcher.stats[k] - base_stats.get(k, 0)
             for k in ("batches", "items")}
    stats["max_batch"] = server.batcher.stats["max_batch"]
    server.stop()

    lat = np.sort(np.asarray(latencies)) * 1000
    out = {
        "metric": f"serve_{Path(str(model)).stem}_{imgsz}_b{batch}",
        "clients": clients,
        "seconds": round(wall, 1),
        "completed": len(lat),
        "errors": errors[0],
        "throughput_img_s": round(len(lat) / wall, 1),
        "p50_ms": round(float(lat[len(lat) // 2]), 1) if len(lat) else None,
        "p90_ms": round(float(lat[int(len(lat) * 0.90)]), 1) if len(lat) else None,
        "p99_ms": round(float(lat[min(int(len(lat) * 0.99), len(lat) - 1)]), 1) if len(lat) else None,
        "device_batches": stats["batches"],
        "mean_batch": round(stats["items"] / max(stats["batches"], 1), 2),
        "max_batch": stats["max_batch"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
