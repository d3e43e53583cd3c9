"""Synthetic YOLO-format detection dataset generator.

No-network stand-in for COCO128/WAID used by tests, the sanity-training
loop and the benchmark harness: colored geometric shapes on textured
backgrounds, one class per shape type, written as a standard YOLO dataset
(images/ + labels/ + data.yaml) so the whole data pipeline is exercised
exactly as with a real dataset.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from experiment_yolo_tpu.utils import yaml_save

SHAPE_NAMES = ["circle", "square", "triangle"]


def _draw_shape(img, cls, cx, cy, r, color):
    if cls == 0:
        cv2.circle(img, (cx, cy), r, color, -1)
    elif cls == 1:
        cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), color, -1)
    else:
        pts = np.asarray([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]], np.int32)
        cv2.fillPoly(img, [pts], color)


def make_synthetic_dataset(
    root: str | Path,
    n_train: int = 64,
    n_val: int = 16,
    imgsz: int = 320,
    max_objects: int = 6,
    seed: int = 0,
) -> Path:
    """Write a synthetic dataset; returns the path of its data.yaml."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = root / "images" / split
        lab_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lab_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 60, (imgsz, imgsz, 3), np.uint8)
            img = cv2.add(cv2.GaussianBlur(img, (7, 7), 0), int(rng.integers(40, 90)))
            lines = []
            for _ in range(int(rng.integers(1, max_objects + 1))):
                cls = int(rng.integers(0, len(SHAPE_NAMES)))
                r = int(rng.integers(imgsz // 20, imgsz // 6))
                cx = int(rng.integers(r, imgsz - r))
                cy = int(rng.integers(r, imgsz - r))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                _draw_shape(img, cls, cx, cy, r, color)
                lines.append(f"{cls} {cx/imgsz:.6f} {cy/imgsz:.6f} {2*r/imgsz:.6f} {2*r/imgsz:.6f}")
            cv2.imwrite(str(img_dir / f"{i:05d}.jpg"), img)
            (lab_dir / f"{i:05d}.txt").write_text("\n".join(lines) + "\n")
    yaml_path = root / "data.yaml"
    yaml_save(
        yaml_path,
        {
            "path": str(root),
            "train": "images/train",
            "val": "images/val",
            "nc": len(SHAPE_NAMES),
            "names": SHAPE_NAMES,
        },
    )
    return yaml_path
