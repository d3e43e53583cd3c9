"""Standalone segmentation ONNX consumer demo — the TPU-native answer to
the reference's ``examples/YOLOv8-Segmentation-ONNXRuntime-Python``
(reference examples/YOLOv8-Segmentation-ONNXRuntime-Python/main.py:
onnxruntime forward + numpy NMS + mask = sigmoid(coeff @ protos) cropped
to each box).

Loads a seg model exported with ``model.export('onnx')`` — the graph
outputs (boxes, scores, coeffs, protos) — and produces per-instance masks
with numpy only. Uses onnxruntime when installed, else the framework's
pure-numpy ONNX interpreter.

Usage:
    python examples/segmentation_onnx_inference.py model.onnx image.jpg \
        [conf=0.25] [out=pred.jpg]

Export a seg model first:
    python -c "from experiment_yolo_tpu.engine.model import YOLO; \
               YOLO('yolov8n-seg.yaml').export('onnx', path='model', imgsz=640)"
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
from onnx_inference import letterbox, nms_numpy, run_model  # noqa: E402


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    onnx_path, img_path = argv[0], argv[1]
    kv = dict(a.partition("=")[::2] for a in argv[2:])
    conf_thres = float(kv.get("conf", 0.25))
    out_path = kv.get("out", "pred.jpg")

    from experiment_yolo_tpu.export.onnx_proto import parse_model

    meta = parse_model(Path(onnx_path).read_bytes())
    size = meta["graph"]["inputs"][0]["dims"][1]

    orig = cv2.imread(img_path)
    canvas, r, left, top = letterbox(orig, size)
    batch = np.ascontiguousarray(canvas[..., ::-1][None])

    boxes_xywh, scores, coeffs, protos = run_model(onnx_path, batch)
    boxes_xywh, scores = boxes_xywh[0], scores[0]
    coeffs, protos = coeffs[0], protos[0]  # (A, nm), (Hp, Wp, nm)

    cls = scores.argmax(-1)
    best = scores.max(-1)
    m = best > conf_thres
    idx = np.nonzero(m)[0]
    b, c, s = boxes_xywh[m], cls[m], best[m]
    xyxy = np.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                     b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1)
    keep = nms_numpy(xyxy, s)
    xyxy, c, s, idx = xyxy[keep], c[keep], s[keep], idx[keep]

    # masks: sigmoid(protos @ coeff), crop to box, upsample to letterbox px
    hp, wp = protos.shape[:2]
    overlay = orig.copy()
    rng = np.random.RandomState(3)
    for k, (box, ai) in enumerate(zip(xyxy, idx)):
        logit = protos.reshape(-1, protos.shape[-1]) @ coeffs[ai]
        prob = 1.0 / (1.0 + np.exp(-logit.reshape(hp, wp)))
        mask = cv2.resize(prob, (size, size))  # letterbox pixels
        # crop to the detection box (reference crop_mask semantics)
        x1, y1, x2, y2 = box
        yy, xx = np.mgrid[0:size, 0:size]
        mask = np.where((xx >= x1) & (xx < x2) & (yy >= y1) & (yy < y2), mask, 0.0)
        # letterbox -> original image pixels
        h, w = orig.shape[:2]
        crop = mask[top : top + int(round(h * r)), left : left + int(round(w * r))]
        mask_orig = cv2.resize(crop, (w, h)) > 0.5
        color = rng.randint(60, 255, 3).tolist()
        overlay[mask_orig] = 0.5 * overlay[mask_orig] + 0.5 * np.array(color)
    for (x1, y1, x2, y2), ci, si in zip(xyxy, c, s):
        p1 = (int((x1 - left) / r), int((y1 - top) / r))
        p2 = (int((x2 - left) / r), int((y2 - top) / r))
        cv2.rectangle(overlay, p1, p2, (0, 220, 40), 2)
        cv2.putText(overlay, f"{int(ci)} {si:.2f}", (p1[0], p1[1] - 4),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 220, 40), 2)
    cv2.imwrite(out_path, overlay)
    print(f"{len(keep)} instances -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
