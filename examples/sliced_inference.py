"""SAHI-style sliced inference demo — the TPU-native answer to the
reference's ``examples/YOLOv8-SAHI-Inference-Video`` (reference
examples/YOLOv8-SAHI-Inference-Video/yolov8_sahi.py: slice each frame,
detect per slice, merge with global NMS).

Small aerial objects (the DEAL-YOLO use case) vanish when a large frame
is letterboxed to 640; slicing keeps them at native resolution. All
slices of one frame run as ONE batched XLA program
(``engine/sliced.py::SlicedPredictor``), so the TPU sees a single large
dispatch instead of the reference's per-slice model calls.

Usage:
    python examples/sliced_inference.py model.ckpt-or-yaml source \
        [slice=512] [overlap=0.2] [conf=0.25] [out=pred.jpg]
"""

from __future__ import annotations

import sys


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    model_path, source = argv[0], argv[1]

    from experiment_yolo_tpu.cfg.cli import parse_key_value
    from experiment_yolo_tpu.engine.model import YOLO

    kv = parse_key_value(argv[2:])
    model = YOLO(model_path)
    out = kv.pop("out", None)
    extra = {k: v for k, v in kv.items() if k not in ("slice", "overlap", "conf")}
    n = 0
    for res in model.sliced_predict(source, stream=True,
                                    slice=int(kv.get("slice", 512)),
                                    overlap=float(kv.get("overlap", 0.2)),
                                    conf=float(kv.get("conf", 0.25)), **extra):
        n += 1
        dets = len(res.boxes) if res.boxes is not None else 0
        print(f"frame {n}: {dets} detections")
        if out and dets:
            import cv2

            cv2.imwrite(out, res.plot())
            print(f"  annotated -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
