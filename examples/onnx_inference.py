"""Standalone ONNX consumer demo — the TPU-native answer to the reference's
``examples/YOLOv8-ONNXRuntime`` (reference examples/YOLOv8-ONNXRuntime/main.py).

Loads a model exported with ``model.export('onnx')`` and runs detection on an
image. Inference uses onnxruntime when installed; otherwise it falls back to
the framework's pure-numpy ONNX interpreter, so the demo runs anywhere.
Pre/post-processing (letterbox, NMS, rescale) is implemented here with numpy
only — exactly what a deployment consumer would write.

Usage:
    python examples/onnx_inference.py model.onnx image.jpg [conf=0.25] [out=pred.jpg]

Export a model first:
    python -c "from experiment_yolo_tpu.engine.model import YOLO; \
               YOLO('yolov8n.yaml').export('onnx', path='model.onnx', imgsz=640)"
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np


def letterbox(img, size):
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    nw, nh = int(round(w * r)), int(round(h * r))
    resized = cv2.resize(img, (nw, nh))
    top = (size - nh) // 2
    left = (size - nw) // 2
    canvas = np.full((size, size, 3), 114, np.uint8)
    canvas[top : top + nh, left : left + nw] = resized
    return canvas, r, left, top


def nms_numpy(boxes, scores, iou_thres=0.7, max_det=300):
    order = scores.argsort()[::-1][: max_det * 4]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1 or len(keep) >= max_det:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[order[1:], 2] - boxes[order[1:], 0]) * (boxes[order[1:], 3] - boxes[order[1:], 1])
        iou = inter / (a1 + a2 - inter + 1e-9)
        order = order[1:][iou <= iou_thres]
    return keep


def run_model(onnx_path, batch_u8):
    blob = Path(onnx_path).read_bytes()
    try:
        import onnxruntime as ort

        sess = ort.InferenceSession(blob, providers=["CPUExecutionProvider"])
        return sess.run(None, {"images": batch_u8})
    except ImportError:
        from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx

        return run_onnx(blob, {"images": batch_u8})


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    onnx_path, img_path = argv[0], argv[1]
    kv = dict(a.partition("=")[::2] for a in argv[2:])
    conf_thres = float(kv.get("conf", 0.25))
    out_path = kv.get("out", "pred.jpg")

    # the exported graph input is (B, S, S, 3) uint8; read S from the model
    from experiment_yolo_tpu.export.onnx_proto import parse_model

    meta = parse_model(Path(onnx_path).read_bytes())
    size = meta["graph"]["inputs"][0]["dims"][1]

    orig = cv2.imread(img_path)
    canvas, r, left, top = letterbox(orig, size)
    batch = canvas[..., ::-1][None]  # BGR -> RGB

    boxes_xywh, scores = run_model(onnx_path, np.ascontiguousarray(batch))
    boxes_xywh, scores = boxes_xywh[0], scores[0]

    cls = scores.argmax(-1)
    best = scores.max(-1)
    m = best > conf_thres
    b, c, s = boxes_xywh[m], cls[m], best[m]
    xyxy = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                     b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1)
    keep = nms_numpy(xyxy, s)
    xyxy, c, s = xyxy[keep], c[keep], s[keep]
    # rescale to original image
    xyxy[:, [0, 2]] = (xyxy[:, [0, 2]] - left) / r
    xyxy[:, [1, 3]] = (xyxy[:, [1, 3]] - top) / r

    for (x1, y1, x2, y2), ci, si in zip(xyxy, c, s):
        cv2.rectangle(orig, (int(x1), int(y1)), (int(x2), int(y2)), (0, 220, 40), 2)
        cv2.putText(orig, f"{int(ci)} {si:.2f}", (int(x1), int(y1) - 4),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 220, 40), 2)
    cv2.imwrite(out_path, orig)
    print(f"{len(keep)} detections -> {out_path}")
    for (x1, y1, x2, y2), ci, si in zip(xyxy, c, s):
        print(f"  cls={int(ci)} conf={si:.3f} box=({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
