"""FPS/latency measurement — counterpart of the reference's top-level
``get_FPS.py`` (fused model, warmup + timed iterations with explicit sync).

Usage:
    python scripts/get_fps.py model=<yaml-or-ckpt> [imgsz=640 batch=8 half=True]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from experiment_yolo_tpu import YOLO
from experiment_yolo_tpu.cfg.cli import parse_key_value
from experiment_yolo_tpu.utils import LOGGER
from experiment_yolo_tpu.utils.benchmarks import benchmark_model


def main(argv):
    kv = parse_key_value(argv)
    src = str(kv.pop("model"))
    half = bool(kv.pop("half", True))
    model = YOLO(src, dtype=jnp.bfloat16 if half else jnp.float32) if src.endswith(".yaml") else YOLO(src)
    out = benchmark_model(
        model.model,
        model.variables,
        imgsz=int(kv.get("imgsz", 640)),
        batch=int(kv.get("batch", 8)),
    )
    LOGGER.info(str(out))


if __name__ == "__main__":
    main(sys.argv[1:])
