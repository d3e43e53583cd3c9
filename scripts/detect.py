"""Prediction entry point — counterpart of the fork's top-level
``detect.py`` (reference detect.py:1-14: YOLO(weights).predict(source=test
images, imgsz=640, save=True)).

Usage:
    python scripts/detect.py model=path source=imgs_or_video [imgsz=640] \
        [conf=0.25] [save=true] ...
"""

from __future__ import annotations

import sys


def main(argv):
    from experiment_yolo_tpu.cfg.cli import parse_key_value

    kv = parse_key_value(argv)
    if "model" not in kv or "source" not in kv:
        print(__doc__)
        return 1

    from experiment_yolo_tpu.engine.model import YOLO

    model = YOLO(kv.pop("model"))
    source = kv.pop("source")
    overrides = dict(imgsz=int(kv.pop("imgsz", 640)), conf=float(kv.pop("conf", 0.25)))
    if bool(kv.pop("save", True)):
        overrides["save"] = True
    overrides.update(kv)
    for res in model.predict(source, stream=True, **overrides):
        n = len(res.boxes) if res.boxes is not None else 0
        print(f"{res.path}: {n} detections " + " ".join(
            f"{res.names.get(int(c), int(c))}:{s:.2f}"
            for c, s in zip(res.boxes.cls, res.boxes.conf)) if n else f"{res.path}: 0 detections")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
