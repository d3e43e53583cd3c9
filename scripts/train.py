"""Flagship training entry point — counterpart of the fork's top-level
``train.py`` (reference train.py:9-24: YOLO('yolov8-ASF-P2.yaml').train(
data='VisDrone.yaml', imgsz=640, epochs=300, batch=8, close_mosaic=10,
optimizer='SGD', ...)).

TPU notes baked into the defaults: batch 128 is the measured train sweet
spot on a v5e chip (docs/KERNELS.md — XLA's batch-minor lane tiling), and
``cache='ram'`` keeps the input pipeline off the step's critical path.

Usage:
    python scripts/train.py [model=yolov8-ASF-P2P2.yaml] [data=path.yaml] \
        [epochs=300] [imgsz=640] [batch=128] [any other cfg key=value]
"""

from __future__ import annotations

import sys


def main(argv):
    from experiment_yolo_tpu.cfg.cli import parse_key_value

    kv = parse_key_value(argv)
    model_cfg = kv.pop("model", "yolov8-ASF-P2P2.yaml")
    if "data" not in kv:
        print(__doc__)
        print("error: data=path/to/dataset.yaml is required")
        return 1

    from experiment_yolo_tpu.engine.model import YOLO

    overrides = dict(
        epochs=int(kv.pop("epochs", 300)),
        imgsz=int(kv.pop("imgsz", 640)),
        batch=int(kv.pop("batch", 128)),
        close_mosaic=int(kv.pop("close_mosaic", 10)),
        optimizer=kv.pop("optimizer", "SGD"),
    )
    overrides.update(kv)
    results = YOLO(model_cfg).train(**overrides)
    print(results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
