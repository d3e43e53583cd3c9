"""Single-vs-double inference visual diff — counterpart of the reference's
``failure_cases.py`` (365 LoC): runs both pipelines and saves side-by-side
images only where the instance counts differ.

Usage:
    python scripts/failure_cases.py model=<ckpt> source=<imgdir> out=failures/
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import cv2
import numpy as np

from experiment_yolo_tpu import YOLO
from experiment_yolo_tpu.cfg.cli import parse_key_value
from experiment_yolo_tpu.engine.double_inference import DoubleInference
from experiment_yolo_tpu.utils import LOGGER


def main(argv):
    kv = parse_key_value(argv)
    model = YOLO(kv.pop("model"))
    source = kv.pop("source")
    out_dir = Path(kv.pop("out", "failure_cases"))
    out_dir.mkdir(parents=True, exist_ok=True)
    singles = model.predict(source, **{k: v for k, v in kv.items() if k in ("conf", "imgsz", "batch")})
    doubler = DoubleInference(model.model, model.variables)
    n_diff = 0
    for r in singles:
        refined = doubler.refine(r)
        if len(refined) != len(r):
            n_diff += 1
            side = np.concatenate([r.plot(), refined.plot()], axis=1)
            name = Path(r.path).stem if r.path != "array" else f"img{n_diff}"
            cv2.imwrite(str(out_dir / f"{name}_single{len(r)}_double{len(refined)}.jpg"), side)
    LOGGER.info(f"{n_diff}/{len(singles)} images changed instance count -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
