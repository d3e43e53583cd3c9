"""Validation entry point — counterpart of the fork's top-level ``val.py``
(reference val.py:1-16: RTDETR(weights).val(data=WAID yaml, split='test',
batch=16)). Works for any checkpoint or exported artifact the facade can
load (.ckpt dir, .onnx, .stablehlo, .tflite).

Usage:
    python scripts/val.py model=path data=dataset.yaml [split=test] [batch=16] ...
"""

from __future__ import annotations

import sys


def main(argv):
    from experiment_yolo_tpu.cfg.cli import parse_key_value

    kv = parse_key_value(argv)
    if "model" not in kv or "data" not in kv:
        print(__doc__)
        return 1

    from experiment_yolo_tpu.engine.model import YOLO

    model = YOLO(kv.pop("model"))
    overrides = dict(split=kv.pop("split", "val"), batch=int(kv.pop("batch", 16)))
    overrides.update(kv)
    metrics = model.val(**overrides)
    print(metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
