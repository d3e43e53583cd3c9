"""Standalone TFLite consumer demo — the TPU-native answer to the
reference's ``examples/YOLOv8-int8-tflite`` (reference
examples/YOLOv8-int8-tflite/main.py: tf.lite.Interpreter + numpy
letterbox/NMS postprocess).

Loads a model exported with ``model.export('tflite')`` (optionally
``int8=True``) and runs detection on an image using ONLY the TFLite
interpreter + numpy/cv2 — exactly what an edge deployment would ship.
The exported graph takes (1, S, S, 3) uint8 and returns
(boxes_xywh, scores) in letterboxed pixels.

Usage:
    python examples/tflite_inference.py model.tflite image.jpg [conf=0.25] [out=pred.jpg]

Export a model first:
    python -c "from experiment_yolo_tpu.engine.model import YOLO; \
               YOLO('yolov8n.yaml').export('tflite', path='model', imgsz=640)"
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from onnx_inference import letterbox, nms_numpy  # noqa: E402


def make_interpreter(tflite_path):
    try:
        from tensorflow.lite.python.interpreter import Interpreter
    except ImportError:  # tflite-runtime-only environments
        from tflite_runtime.interpreter import Interpreter  # type: ignore

    interp = Interpreter(model_path=str(tflite_path))
    interp.allocate_tensors()
    return interp


def run_model(interp, batch_u8):
    """Run a batch through an allocated interpreter -> (boxes, scores)."""
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], np.asarray(batch_u8, inp["dtype"]))
    interp.invoke()
    dets = interp.get_output_details()
    outs = [interp.get_tensor(o["index"]) for o in dets]
    # (boxes, scores): boxes end in 4; if ambiguous fall back to name order
    four = [o for o in outs if o.shape[-1] == 4]
    rest = [o for o in outs if o.shape[-1] != 4]
    if len(four) == 1 and rest:
        return four[0], rest[0]
    order = sorted(range(len(outs)), key=lambda i: dets[i]["name"])
    return outs[order[0]], outs[order[1]]


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    tflite_path, img_path = argv[0], argv[1]
    kv = dict(a.partition("=")[::2] for a in argv[2:])
    conf_thres = float(kv.get("conf", 0.25))
    out_path = kv.get("out", "pred.jpg")

    orig = cv2.imread(img_path)
    if orig is None:
        print(f"cannot read image: {img_path}")
        return 1

    interp = make_interpreter(tflite_path)
    size = int(interp.get_input_details()[0]["shape"][1])

    canvas, r, left, top = letterbox(orig, size)
    batch = np.ascontiguousarray(canvas[..., ::-1][None])  # BGR -> RGB

    boxes_xywh, scores = run_model(interp, batch)
    boxes_xywh, scores = np.asarray(boxes_xywh[0], np.float32), np.asarray(scores[0], np.float32)

    cls = scores.argmax(-1)
    best = scores.max(-1)
    m = best > conf_thres
    b, c, s = boxes_xywh[m], cls[m], best[m]
    xyxy = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                     b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1)
    keep = nms_numpy(xyxy, s)
    xyxy, c, s = xyxy[keep], c[keep], s[keep]
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
