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
        # track ids, set by Model.track (reference Boxes.id, results.py:is_track)
        self.id: Optional[np.ndarray] = None

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


class Masks:
    """Instance masks in original-image space (reference results.py:460).
    data: (N, Ho, Wo) bool."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, bool)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)


class Keypoints:
    """Pose keypoints in original-image space (reference results.py:500).
    data: (N, nk, 2|3) [x, y(, conf)]."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self) -> np.ndarray:
        return self.data[..., :2]

    @property
    def conf(self) -> Optional[np.ndarray]:
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class OBB:
    """Oriented boxes in original-image space (reference results.py:595).
    data: (N, 7) [cx, cy, w, h, rad, conf, cls]."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, np.float32).reshape(-1, 7)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xywhr(self) -> np.ndarray:
        return self.data[:, :5]

    @property
    def conf(self) -> np.ndarray:
        return self.data[:, 5]

    @property
    def cls(self) -> np.ndarray:
        return self.data[:, 6]

    @property
    def xyxyxyxy(self) -> np.ndarray:
        """(N, 4, 2) corner points (reference ops.xywhr2xyxyxyxy)."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx1, dy1 = w / 2 * cos, w / 2 * sin
        dx2, dy2 = -h / 2 * sin, h / 2 * cos
        c = np.stack([cx, cy], -1)
        return np.stack(
            [c + np.stack([dx1 + dx2, dy1 + dy2], -1),
             c + np.stack([dx1 - dx2, dy1 - dy2], -1),
             c - np.stack([dx1 + dx2, dy1 + dy2], -1),
             c - np.stack([dx1 - dx2, dy1 - dy2], -1)], 1
        )


class Probs:
    """Classification probabilities (reference results.py:549)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32).reshape(-1)

    @property
    def top1(self) -> int:
        return int(self.data.argmax())

    @property
    def top1conf(self) -> float:
        return float(self.data.max())

    @property
    def top5(self) -> np.ndarray:
        return np.argsort(-self.data)[:5]


class Results:
    """One image's predictions + metadata."""

    def __init__(self, orig_img: np.ndarray, path: str, names: Dict[int, str],
                 boxes: Optional[np.ndarray], speed: Optional[dict] = None,
                 masks: Optional[np.ndarray] = None,
                 keypoints: Optional[np.ndarray] = None,
                 obb: Optional[np.ndarray] = None,
                 probs: Optional[np.ndarray] = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBB(obb, self.orig_shape) if obb is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.speed = speed or {}

    def __len__(self):
        if self.boxes is not None:
            return len(self.boxes)
        return len(self.obb) if self.obb is not None else 0

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5) -> np.ndarray:
        """Draw boxes/masks/keypoints/oriented boxes on a copy of the
        original (BGR) image."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        if self.masks is not None and self.boxes is not None:
            for m, cls in zip(self.masks.data, self.boxes.cls):
                color = np.asarray(_class_color(int(cls)), np.float32)
                img[m] = (0.6 * img[m] + 0.4 * color).astype(img.dtype)
        if self.boxes is not None:
            for x1, y1, x2, y2, conf, cls in self.boxes.data:
                c = int(cls)
                color = _class_color(c)
                cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
                label = f"{self.names.get(c, c)} {conf:.2f}"
                cv2.putText(img, label, (int(x1), max(int(y1) - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, max(lw - 1, 1))
        if self.obb is not None:
            for pts, conf, cls in zip(self.obb.xyxyxyxy, self.obb.conf, self.obb.cls):
                cv2.polylines(img, [pts.astype(np.int32)], True, _class_color(int(cls)), lw)
        if self.keypoints is not None:
            for inst in self.keypoints.data:
                for kp in inst:
                    if kp.shape[-1] < 3 or kp[2] > 0.5:
                        cv2.circle(img, (int(kp[0]), int(kp[1])), max(lw, 2), (0, 255, 0), -1)
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

    def tojson(self, normalize: bool = False) -> str:
        """JSON string of detections (reference results.py:tojson)."""
        import json

        recs = self.to_dict()
        if normalize:
            h, w = self.orig_shape
            for r in recs:
                b = r["box"]
                b["x1"], b["x2"] = b["x1"] / w, b["x2"] / w
                b["y1"], b["y2"] = b["y1"] / h, b["y2"] / h
        return json.dumps(recs, indent=2)

    def verbose(self) -> str:
        """Per-class count summary line (reference results.py:verbose)."""
        if self.probs is not None:
            return ", ".join(
                f"{self.names.get(int(k), int(k))} {float(self.probs.data[k]):.2f}"
                for k in self.probs.top5) + ", "
        if self.boxes is None or not len(self.boxes):
            return "(no detections), "
        cls = self.boxes.cls.astype(int)
        return "".join(
            f"{(cls == c).sum()} {self.names.get(int(c), int(c))}"
            f"{'s' if (cls == c).sum() > 1 else ''}, "
            for c in sorted(set(cls.tolist())))

    def save_crop(self, save_dir: str | Path, file_name: str | Path = "im.jpg") -> None:
        """Save one crop per detection into save_dir/<class name>/
        (reference results.py:save_crop; crops get a 2% gain + 10px pad
        like the reference's save_one_box defaults)."""
        import cv2

        h, w = self.orig_shape
        stem, suffix = Path(file_name).stem, Path(file_name).suffix or ".jpg"
        for i in range(len(self.boxes)):
            x1, y1, x2, y2 = self.boxes.xyxy[i]
            bw, bh = x2 - x1, y2 - y1
            # reference save_one_box: xyxy * gain 1.02 + pad 10
            px, py = bw * 0.01 + 10, bh * 0.01 + 10
            xa, ya = max(int(x1 - px), 0), max(int(y1 - py), 0)
            xb, yb = min(int(x2 + px), w), min(int(y2 + py), h)
            crop = self.orig_img[ya:yb, xa:xb]
            cname = str(self.names.get(int(self.boxes.cls[i]), int(self.boxes.cls[i])))
            d = Path(save_dir) / cname
            d.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(d / f"{stem}{i if i else ''}{suffix}"), crop)


def _class_color(c: int):
    rng = np.random.RandomState(c + 3)
    return tuple(int(x) for x in rng.randint(64, 255, 3))
