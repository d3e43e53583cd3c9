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


def _draw_shape(img, cls, cx, cy, rx, ry, color):
    """Draw one shape with independent x/y half-extents (aspect variety)."""
    if cls == 0:
        cv2.ellipse(img, (cx, cy), (rx, ry), 0, 0, 360, color, -1)
    elif cls == 1:
        cv2.rectangle(img, (cx - rx, cy - ry), (cx + rx, cy + ry), color, -1)
    else:
        pts = np.asarray(
            [[cx, cy - ry], [cx - rx, cy + ry], [cx + rx, cy + ry]], np.int32
        )
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
                # log-uniform scale (small objects dominate, the DEAL/UAV
                # regime) and aspect ratios 1:2 .. 2:1 (VERDICT r3 item 9:
                # more scale/aspect variety than the square-only original)
                r = int(round(np.exp(rng.uniform(
                    np.log(max(imgsz // 28, 3)), np.log(imgsz // 5)))))
                a = float(np.exp(rng.uniform(np.log(0.5), np.log(2.0))))
                rx = int(np.clip(round(r * a), 2, imgsz // 3))
                ry = int(np.clip(round(r / a), 2, imgsz // 3))
                cx = int(rng.integers(rx, imgsz - rx))
                cy = int(rng.integers(ry, imgsz - ry))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                _draw_shape(img, cls, cx, cy, rx, ry, color)
                lines.append(
                    f"{cls} {cx/imgsz:.6f} {cy/imgsz:.6f} "
                    f"{2*rx/imgsz:.6f} {2*ry/imgsz:.6f}"
                )
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


def make_synthetic_task_dataset(
    root: str | Path,
    task: str,
    n_train: int = 32,
    n_val: int = 8,
    imgsz: int = 256,
    max_objects: int = 4,
    seed: int = 0,
    nk: int = 5,
) -> Path:
    """Synthetic dataset for segment/pose/obb tasks (YOLO txt formats).

    - segment: filled polygons, labels = normalized polygon points;
    - pose: "star" objects with nk predictable keypoints (center + ring),
      labels = box + nk (x, y, vis) triplets; kpt_shape written to data.yaml;
    - obb: rotated filled rectangles, labels = 4 corner points.
    """
    root = Path(root)
    rng = np.random.default_rng(seed)
    names = ["blob"] if task != "segment" else ["poly3", "poly5"]
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
                r = int(rng.integers(imgsz // 12, imgsz // 6))
                cx = int(rng.integers(r + 2, imgsz - r - 2))
                cy = int(rng.integers(r + 2, imgsz - r - 2))
                color = tuple(int(c) for c in rng.integers(120, 255, 3))
                if task == "segment":
                    cls = int(rng.integers(0, 2))
                    k = 3 if cls == 0 else 5
                    ang = rng.uniform(0, 2 * np.pi)
                    pts = np.stack(
                        [cx + r * np.cos(ang + 2 * np.pi * np.arange(k) / k),
                         cy + r * np.sin(ang + 2 * np.pi * np.arange(k) / k)], -1)
                    cv2.fillPoly(img, [pts.astype(np.int32)], color)
                    flat = " ".join(f"{v:.6f}" for v in (pts / imgsz).reshape(-1))
                    lines.append(f"{cls} {flat}")
                elif task == "obb":
                    w2, h2 = r, max(r // 2, 4)
                    ang = rng.uniform(0, np.pi / 2)
                    c, s = np.cos(ang), np.sin(ang)
                    box = np.asarray([[-w2, -h2], [w2, -h2], [w2, h2], [-w2, h2]], np.float32)
                    pts = box @ np.asarray([[c, s], [-s, c]], np.float32) + [cx, cy]
                    cv2.fillPoly(img, [pts.astype(np.int32)], color)
                    flat = " ".join(f"{v:.6f}" for v in (pts / imgsz).reshape(-1))
                    lines.append(f"0 {flat}")
                else:  # pose: ring of nk keypoints marked as dots
                    cv2.circle(img, (cx, cy), r, color, 2)
                    kps = [(cx, cy)]
                    for j in range(nk - 1):
                        a = 2 * np.pi * j / (nk - 1)
                        kps.append((cx + r * np.cos(a), cy + r * np.sin(a)))
                    for x, y in kps:
                        cv2.circle(img, (int(x), int(y)), 3, (255, 255, 255), -1)
                    box = f"{cx/imgsz:.6f} {cy/imgsz:.6f} {2.2*r/imgsz:.6f} {2.2*r/imgsz:.6f}"
                    kp = " ".join(f"{x/imgsz:.6f} {y/imgsz:.6f} 2" for x, y in kps)
                    lines.append(f"0 {box} {kp}")
            cv2.imwrite(str(img_dir / f"{i:05d}.jpg"), img)
            (lab_dir / f"{i:05d}.txt").write_text("\n".join(lines) + "\n")
    yaml_path = root / "data.yaml"
    meta = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "nc": len(names),
        "names": names,
    }
    if task == "pose":
        meta["kpt_shape"] = [nk, 3]
    yaml_save(yaml_path, meta)
    return yaml_path
