"""Region counting demo — the TPU-native answer to the reference's
``examples/YOLOv8-Region-Counter`` (reference
examples/YOLOv8-Region-Counter/yolov8_region_counter.py: track a video,
count objects whose center lies inside movable region polygons).

Tracks a source (video file, directory, or glob of images treated as
frames) with ByteTrack and feeds each frame's tracked boxes to
``solutions.ObjectCounter`` — objects are counted as they cross into /
out of the region polygon.

Usage:
    python examples/region_counter.py model.ckpt-or-yaml source \
        [region=x1,y1;x2,y2;x3,y3;x4,y4] [conf=0.25] [imgsz=640]

With no region given, the middle half of the first frame is used.
"""

from __future__ import annotations

import sys

import numpy as np


def parse_region(spec: str):
    return [tuple(float(v) for v in pt.split(",")) for pt in spec.split(";")]


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    model_path, source = argv[0], argv[1]

    from experiment_yolo_tpu.cfg.cli import parse_key_value
    from experiment_yolo_tpu.engine.model import YOLO
    from experiment_yolo_tpu.solutions import ObjectCounter

    kv = parse_key_value(argv[2:])

    model = YOLO(model_path)
    counter = None
    n_frames = 0
    for res in model.track(source, stream=True, persist=True,
                           conf=float(kv.get("conf", 0.25)),
                           imgsz=int(kv.get("imgsz", 640))):
        n_frames += 1
        if counter is None:
            if "region" in kv:
                region = parse_region(kv["region"])
            else:  # middle half of the frame
                h, w = res.orig_shape
                region = [(w * 0.25, h * 0.25), (w * 0.75, h * 0.25),
                          (w * 0.75, h * 0.75), (w * 0.25, h * 0.75)]
            counter = ObjectCounter(region)
        if res.boxes is None or res.boxes.id is None or not len(res.boxes):
            continue
        counter.update(np.asarray(res.boxes.xyxy),
                       np.asarray(res.boxes.id),
                       np.asarray(res.boxes.cls))
    print(f"{n_frames} frames: in={counter.in_count} out={counter.out_count}"
          if counter else f"{n_frames} frames: no detections")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
