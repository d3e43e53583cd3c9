"""Prediction result containers.

Rebuild of the reference's ``engine/results.py`` (Results:66, Boxes:378):
numpy-backed, with ``.boxes.xyxy/conf/cls``, ``plot()`` box drawing,
``save_txt()`` and ``to_dict()``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


class Boxes:
    """Detection boxes in original-image space. data: (N, 6) [xyxy, conf, cls]."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 6)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xyxy(self) -> np.ndarray:
        return self.data[:, :4]

    @property
    def conf(self) -> np.ndarray:
        return self.data[:, 4]

    @property
    def cls(self) -> np.ndarray:
        return self.data[:, 5]

    @property
    def xywh(self) -> np.ndarray:
        b = self.data[:, :4]
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1
        )

    @property
    def xyxyn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xyxy / np.asarray([w, h, w, h])

    @property
    def xywhn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xywh / np.asarray([w, h, w, h])


class Results:
    """One image's predictions + metadata."""

    def __init__(self, orig_img: np.ndarray, path: str, names: Dict[int, str], boxes: np.ndarray, speed: Optional[dict] = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape)
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes)

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5) -> np.ndarray:
        """Draw boxes on a copy of the original (BGR) image."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        for x1, y1, x2, y2, conf, cls in self.boxes.data:
            c = int(cls)
            color = _class_color(c)
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
            label = f"{self.names.get(c, c)} {conf:.2f}"
            cv2.putText(img, label, (int(x1), max(int(y1) - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, max(lw - 1, 1))
        return img

    def save(self, filename: str | Path) -> None:
        import cv2

        cv2.imwrite(str(filename), self.plot())

    def save_txt(self, txt_file: str | Path, save_conf: bool = False) -> None:
        """YOLO-format txt (normalized xywh), reference results.py:save_txt."""
        lines = []
        for i in range(len(self.boxes)):
            xywhn = self.boxes.xywhn[i]
            c = int(self.boxes.cls[i])
            line = (c, *xywhn) + ((float(self.boxes.conf[i]),) if save_conf else ())
            lines.append(("%g " * len(line)).rstrip() % line)
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + "\n")

    def to_dict(self) -> list:
        out = []
        for x1, y1, x2, y2, conf, cls in self.boxes.data:
            out.append(
                {
                    "name": self.names.get(int(cls), str(int(cls))),
                    "class": int(cls),
                    "confidence": float(conf),
                    "box": {"x1": float(x1), "y1": float(y1), "x2": float(x2), "y2": float(y2)},
                }
            )
        return out


def _class_color(c: int):
    rng = np.random.RandomState(c + 3)
    return tuple(int(x) for x in rng.randint(64, 255, 3))
