"""YOLO-format detection dataset with the v8 augmentation pipeline.

Rebuild of the reference's ``ultralytics/data/dataset.py:23`` (YOLODataset)
+ ``base.py:21`` (BaseDataset): scans images, reads YOLO txt labels
(cls cx cy w h normalized), applies mosaic/affine/HSV/flip augmentation,
and emits static-shape samples (uint8 RGB image + padded labels).

The dataset yaml contract matches the reference (path/train/val/test/names —
``data/utils.py:check_det_dataset``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from experiment_yolo_tpu.data import augment as A
from experiment_yolo_tpu.utils import LOGGER, yaml_load

IMG_FORMATS = {"bmp", "jpeg", "jpg", "png", "tif", "tiff", "webp"}


def check_det_dataset(data: str | Path | dict) -> dict:
    """Resolve a dataset yaml into {train, val, test, names, nc, path}."""
    d = data if isinstance(data, dict) else yaml_load(data)
    root = Path(d.get("path") or Path(str(d.get("yaml_file", "."))).parent)
    out = {"path": root}
    for split in ("train", "val", "test"):
        v = d.get(split)
        if v:
            p = Path(v)
            out[split] = p if p.is_absolute() else root / p
    names = d.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    out["names"] = names or {}
    out["nc"] = d.get("nc", len(out["names"]))
    for k in ("kpt_shape", "flip_idx"):  # pose dataset extras
        if k in d:
            out[k] = d[k]
    return out


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference data/utils.py convention)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return sb.join(str(img_path).rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt"


def check_cls_dataset(dataset: str | Path, split: str = "") -> dict:
    """Resolve a classification dataset dir (ImageNet-style class folders).

    Reference ``data/utils.py:check_cls_dataset``: accepts a directory (or a
    URL — downloaded via safe_download), discovers train/val|validation/test
    splits, counts classes from train subdirectories, and returns
    {train, val, test, nc, names}. Raises if the train split has no images.
    """
    if str(dataset).startswith(("http://", "https://", "file://")):
        from experiment_yolo_tpu.utils.downloads import safe_download

        dataset = safe_download(str(dataset), dir=Path("datasets"), unzip=True)
    data_dir = Path(dataset).resolve()
    if not data_dir.is_dir():
        raise FileNotFoundError(f"classification dataset not found: {data_dir}")
    train_set = data_dir / "train"
    val_set = (
        data_dir / "val" if (data_dir / "val").exists()
        else data_dir / "validation" if (data_dir / "validation").exists()
        else None
    )
    test_set = data_dir / "test" if (data_dir / "test").exists() else None
    if split == "val" and not val_set:
        LOGGER.warning("split=val not found, using split=test instead")
    elif split == "test" and not test_set:
        LOGGER.warning("split=test not found, using split=val instead")

    names = sorted(x.name for x in train_set.iterdir() if x.is_dir()) if train_set.exists() else []
    nc = len(names)
    for k, v in {"train": train_set, "val": val_set, "test": test_set}.items():
        if v is None:
            continue
        files = [p for p in v.rglob("*.*") if p.suffix.lstrip(".").lower() in IMG_FORMATS]
        nd = len({f.parent for f in files})
        if not files and k == "train":
            raise FileNotFoundError(f"{dataset} '{k}:' no training images found")
        if files and nd != nc:
            LOGGER.warning(f"{k}: found {len(files)} images in {nd} classes (expected {nc})")
    return {"train": train_set, "val": val_set, "test": test_set,
            "nc": nc, "names": dict(enumerate(names))}


class YOLODataset:
    """Detection dataset: file scan + label parse + v8 transforms."""

    def __init__(
        self,
        img_path: str | Path,
        imgsz: int = 640,
        augment: bool = True,
        hyp=None,
        max_labels: int = 128,
        fraction: float = 1.0,
        single_cls: bool = False,
        task: str = "detect",
        kpt_shape=(17, 3),
        flip_idx=None,
        cache: str | bool = False,
    ):
        self.img_path = Path(img_path)
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        self.max_labels = max_labels
        self.single_cls = single_cls
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.flip_idx = flip_idx
        self.im_files = self._scan_images(fraction)
        self.labels = self._load_labels_cached()
        self.mosaic_enabled = bool(augment and hyp is not None and getattr(hyp, "mosaic", 0) > 0)
        from experiment_yolo_tpu.data import native_loader as _nl

        self._native = _nl.available()
        # image cache (reference base.py:205 cache_images): 'ram' keeps
        # decoded arrays, 'disk' memoizes decodes as .npy next to the image
        self.cache = {True: "ram", "True": "ram"}.get(cache, cache) or ""
        self._ims: List[Optional[np.ndarray]] = [None] * len(self.im_files)

    # -- label cache ---------------------------------------------------------
    def _cache_key(self) -> str:
        """Fingerprint of the dataset contents: file list + label sizes/mtimes
        (reference data/utils.py:get_hash)."""
        import hashlib

        h = hashlib.sha1()
        for f in self.im_files:
            h.update(f.encode())
            lp = img2label_path(f)
            try:
                st = os.stat(lp)
                h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(b"-")
        h.update(f"{self.task}:{self.kpt_shape}:{self.single_cls}".encode())
        return h.hexdigest()

    def _load_labels_cached(self) -> List[Dict]:
        """Parse labels once, verify images in a thread pool, and memoize to a
        ``.cache.npy`` sidecar (reference dataset.py:cache_labels +
        base.py:182-204): subsequent epochs/runs skip the per-file txt parse
        and the corrupt-image scan entirely."""
        lbl_dir = Path(img2label_path(self.im_files[0])).parent
        cache_file = lbl_dir.parent / f"{lbl_dir.name}.cache.npy"
        key = self._cache_key()
        try:
            blob = np.load(cache_file, allow_pickle=True).item()
            if blob.get("hash") == key and blob.get("version") == 1:
                self.im_files = list(blob["im_files"])
                return list(blob["labels"])
        except (OSError, ValueError, EOFError, KeyError):
            pass
        # verify images concurrently (decode headers only), drop corrupt ones
        from concurrent.futures import ThreadPoolExecutor

        def verify(f: str) -> Optional[str]:
            try:
                from PIL import Image

                with Image.open(f) as im:
                    im.verify()
                    w, h = im.size
                if w < 10 or h < 10:
                    return f"image too small {w}x{h}"
            except ImportError:
                if cv2.imread(f) is None:
                    return "unreadable image"
            except Exception as e:  # corrupt file
                return f"corrupt image: {e}"
            return None

        with ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1)) as ex:
            problems = list(ex.map(verify, self.im_files))
        bad = [(f, msg) for f, msg in zip(self.im_files, problems) if msg]
        for f, msg in bad[:5]:
            LOGGER.warning(f"ignoring {f}: {msg}")
        if bad:
            LOGGER.warning(f"{len(bad)} corrupt image(s) dropped")
            self.im_files = [f for f, msg in zip(self.im_files, problems) if not msg]
            if not self.im_files:
                raise FileNotFoundError(f"all images in {self.img_path} are corrupt")
            key = self._cache_key()
        labels = [self._load_label(f) for f in self.im_files]
        try:
            np.save(cache_file, {"hash": key, "version": 1, "im_files": self.im_files, "labels": labels})
        except OSError as e:
            LOGGER.warning(f"label cache not writable ({e}); continuing uncached")
        return labels

    def _scan_images(self, fraction: float) -> List[str]:
        p = self.img_path
        if p.is_dir():
            files = sorted(
                str(f) for f in p.rglob("*") if f.suffix.lstrip(".").lower() in IMG_FORMATS
            )
        elif p.is_file():  # txt file listing image paths
            files = [ln.strip() for ln in p.read_text().splitlines() if ln.strip()]
        else:
            raise FileNotFoundError(f"image path {p} does not exist")
        if not files:
            raise FileNotFoundError(f"no images found in {p}")
        if fraction < 1.0:
            files = files[: max(1, int(len(files) * fraction))]
        return files

    def _load_label(self, img_file: str) -> Dict:
        """Parse one YOLO txt label file by task (reference data/utils.py
        verify_image_label formats):

        - detect: ``cls cx cy w h`` normalized;
        - segment: ``cls x1 y1 x2 y2 ...`` normalized polygon (bbox = hull);
        - pose: ``cls cx cy w h  kx ky [kv] * nk`` normalized;
        - obb: ``cls x1 y1 ... x4 y4`` normalized corner points.
        """
        lp = img2label_path(img_file)
        cls, boxes = [], []
        segments, keypoints, corners = [], [], []
        nk, ndim = self.kpt_shape
        if os.path.isfile(lp):
            for ln in Path(lp).read_text().splitlines():
                parts = ln.split()
                if len(parts) < 5:
                    continue
                c = 0.0 if self.single_cls else float(parts[0])
                vals = np.asarray([float(x) for x in parts[1:]], np.float32)
                if self.task == "segment":
                    pts = vals.reshape(-1, 2)
                    segments.append(pts)
                    lo, hi = pts.min(0), pts.max(0)
                    boxes.append([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]])
                elif self.task == "obb" and len(vals) == 8:
                    pts = vals.reshape(4, 2)
                    corners.append(pts)
                    lo, hi = pts.min(0), pts.max(0)
                    boxes.append([(lo[0] + hi[0]) / 2, (lo[1] + hi[1]) / 2, hi[0] - lo[0], hi[1] - lo[1]])
                elif self.task == "pose":
                    boxes.append(vals[:4].tolist())
                    kp = vals[4 : 4 + nk * ndim].reshape(nk, ndim)
                    if ndim == 2:  # synthesize full visibility
                        kp = np.concatenate([kp, np.ones((nk, 1), np.float32)], -1)
                    keypoints.append(kp)
                else:
                    boxes.append(vals[:4].tolist())
                cls.append(c)
        out = {
            "cls": np.asarray(cls, np.float32),
            "bboxes_n": np.asarray(boxes, np.float32).reshape(-1, 4),  # normalized xywh
        }
        if self.task == "segment":
            out["segments_n"] = segments
        elif self.task == "pose":
            out["keypoints_n"] = (
                np.stack(keypoints) if keypoints else np.zeros((0, nk, 3), np.float32)
            )
        elif self.task == "obb":
            out["obb_n"] = np.stack(corners) if corners else np.zeros((0, 4, 2), np.float32)
        return out

    def __len__(self) -> int:
        return len(self.im_files)

    def _load_item(self, i: int) -> Dict:
        """Load image + labels in pixel xyxy.

        Uses the native C++ decoder (data/native_loader.py) when built —
        bit-exact with cv2 for JPEG, GIL-free; falls back to cv2. With
        cache='ram' decoded images persist in memory; with 'disk' as .npy
        sidecars (reference base.py:205-230).
        """
        img = None
        cached = False
        if self.cache == "ram" and self._ims[i] is not None:
            img, cached = self._ims[i], True
        elif self.cache == "disk":
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                try:
                    img, cached = np.load(npy), True
                except (OSError, ValueError):
                    img = None
        if img is None and self._native:
            try:
                from experiment_yolo_tpu.data import native_loader as nl

                img = nl.decode_image(self.im_files[i])[..., ::-1]  # RGB -> BGR
            except (ValueError, RuntimeError):
                img = None
        if img is None:
            img = cv2.imread(self.im_files[i])
        if img is None:
            raise FileNotFoundError(f"could not read image {self.im_files[i]}")
        if not cached:
            if self.cache == "ram":
                self._ims[i] = img
            elif self.cache == "disk":
                try:
                    np.save(Path(self.im_files[i]).with_suffix(".npy"), np.ascontiguousarray(img))
                except OSError:
                    pass
        h, w = img.shape[:2]
        lab = self.labels[i]
        n = len(lab["cls"])
        if n:
            b = lab["bboxes_n"]
            xyxy = np.stack(
                [
                    (b[:, 0] - b[:, 2] / 2) * w,
                    (b[:, 1] - b[:, 3] / 2) * h,
                    (b[:, 0] + b[:, 2] / 2) * w,
                    (b[:, 1] + b[:, 3] / 2) * h,
                ],
                axis=1,
            ).astype(np.float32)
        else:
            xyxy = np.zeros((0, 4), np.float32)
        out = {"img": img, "bboxes": xyxy, "cls": lab["cls"].copy(), "im_file": self.im_files[i], "ori_shape": (h, w)}
        wh = np.asarray([w, h], np.float32)
        if self.task == "segment":
            out["segments"] = [p * wh for p in lab["segments_n"]]
        elif self.task == "pose":
            kp = lab["keypoints_n"].copy()
            kp[..., :2] *= wh
            out["keypoints"] = kp
        elif self.task == "obb":
            out["obb"] = lab["obb_n"] * wh
        return out

    def get_sample(self, i: int, rng: np.random.Generator, mosaic: Optional[bool] = None) -> Dict[str, np.ndarray]:
        """One augmented, formatted sample (static shapes)."""
        hyp = self.hyp
        use_mosaic = self.mosaic_enabled if mosaic is None else mosaic
        if use_mosaic and rng.random() < getattr(hyp, "mosaic", 1.0):
            # 9-image grid with probability hyp.mosaic9 (reference Mosaic(n=9))
            if rng.random() < getattr(hyp, "mosaic9", 0.0):
                idxs = [i] + list(rng.integers(0, len(self), 8))
                lab = A.mosaic9([self._load_item(j) for j in idxs], self.imgsz, rng)
            else:
                idxs = [i] + list(rng.integers(0, len(self), 3))
                lab = A.mosaic4([self._load_item(j) for j in idxs], self.imgsz, rng)
            # CopyPaste sits between Mosaic and RandomPerspective
            # (reference v8_transforms pre_transform ordering)
            lab = A.copy_paste(lab, getattr(hyp, "copy_paste", 0.0), rng)
            lab = A.random_perspective(
                lab,
                degrees=getattr(hyp, "degrees", 0.0),
                translate=getattr(hyp, "translate", 0.1),
                scale=getattr(hyp, "scale", 0.5),
                shear=getattr(hyp, "shear", 0.0),
                perspective=getattr(hyp, "perspective", 0.0),
                rng=rng,
            )
            if getattr(hyp, "mixup", 0.0) > 0 and rng.random() < hyp.mixup:
                j = int(rng.integers(0, len(self)))
                lab2 = A.mosaic4([self._load_item(j)] + [self._load_item(int(k)) for k in rng.integers(0, len(self), 3)], self.imgsz, rng)
                lab2 = A.random_perspective(lab2, translate=getattr(hyp, "translate", 0.1), scale=getattr(hyp, "scale", 0.5), rng=rng)
                lab = A.mixup(lab, lab2, rng)
        else:
            lab = A.letterbox_labels(self._load_item(i), self.imgsz, scaleup=self.augment)
            if self.augment:
                lab = A.random_perspective(
                    lab,
                    degrees=getattr(hyp, "degrees", 0.0),
                    translate=getattr(hyp, "translate", 0.1),
                    scale=getattr(hyp, "scale", 0.5),
                    shear=getattr(hyp, "shear", 0.0),
                    perspective=getattr(hyp, "perspective", 0.0),
                    rng=rng,
                )
        if self.augment:
            lab["img"] = A.random_hsv(
                lab["img"],
                getattr(hyp, "hsv_h", 0.015),
                getattr(hyp, "hsv_s", 0.7),
                getattr(hyp, "hsv_v", 0.4),
                rng,
            )
            lab = A.random_flip(lab, "vertical", getattr(hyp, "flipud", 0.0), rng)
            lab = A.random_flip(
                lab, "horizontal", getattr(hyp, "fliplr", 0.5), rng, flip_idx=self.flip_idx
            )
        return A.format_sample(lab, self.imgsz, self.max_labels, task=self.task, kpt_shape=self.kpt_shape)

    def get_val_sample(self, i: int, shape=None) -> Dict[str, np.ndarray]:
        """Deterministic letterboxed sample + original-space metadata.

        `shape` (h, w) overrides the square imgsz (rect batching)."""
        item = self._load_item(i)
        lab = A.letterbox_labels(item, shape or self.imgsz, scaleup=True)
        out = A.format_sample(lab, self.imgsz, self.max_labels, task=self.task, kpt_shape=self.kpt_shape)
        out["ori_shape"] = np.asarray(item["ori_shape"], np.int32)
        out["ratio_pad"] = np.asarray([lab["ratio_pad"][0], *lab["ratio_pad"][1]], np.float32)
        return out

    def image_shapes(self) -> np.ndarray:
        """(N, 2) original (h, w) per image, from headers (no full decode)."""
        if not hasattr(self, "_shapes"):
            from PIL import Image

            shapes = []
            for f in self.im_files:
                with Image.open(f) as im:
                    w, h = im.size
                shapes.append((h, w))
            self._shapes = np.asarray(shapes, np.int32)
        return self._shapes
