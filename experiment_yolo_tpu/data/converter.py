"""Dataset format converters (reference: ultralytics/data/converter.py:1-542).

COCO-JSON -> YOLO-txt conversion (boxes / segments / keypoints), the
91<->80 COCO class-id maps, DOTA -> YOLO-OBB conversion, and the
SAM-assisted box->segment dataset upgrade. Pure numpy + stdlib — conversion
is host-side tooling, not device work.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "coco91_to_coco80_class",
    "coco80_to_coco91_class",
    "convert_coco",
    "convert_dota_to_yolo_obb",
    "merge_multi_segment",
    "yolo_bbox2segment",
]

# The 80 COCO detection classes occupy a sparse subset of the original 91
# paper ids: ids 12, 26, 29, 30, 45, 66, 68, 69, 71, 83 and 91 are unused
# (reference converter.py:14-121 spells the same map as a literal table).
_COCO91_UNUSED = frozenset({12, 26, 29, 30, 45, 66, 68, 69, 71, 83, 91})


def coco91_to_coco80_class() -> List[Optional[int]]:
    """91-index (paper) -> 80-index (dataset) class map.

    Returns a 91-long list: entry i is the 80-class id of paper class i+1,
    or None for the 10 ids absent from the detection task.
    """
    out: List[Optional[int]] = []
    next_id = 0
    for paper_id in range(1, 92):
        if paper_id in _COCO91_UNUSED:
            out.append(None)
        else:
            out.append(next_id)
            next_id += 1
    return out


def coco80_to_coco91_class() -> List[int]:
    """80-index (dataset) -> 91-index (paper) class map (converter.py:124)."""
    return [i + 1 for i in range(91) if (i + 1) not in _COCO91_UNUSED]


def min_index(arr1: np.ndarray, arr2: np.ndarray):
    """Index pair (i, j) minimizing distance between point sets (N,2),(M,2)."""
    dis = ((arr1[:, None, :] - arr2[None, :, :]) ** 2).sum(-1)
    return np.unravel_index(np.argmin(dis, axis=None), dis.shape)


def merge_multi_segment(segments: Sequence[Sequence[float]]) -> List[np.ndarray]:
    """Connect multiple COCO polygon parts into one ring.

    Joins each consecutive part at its closest point pair, walking forward
    then back so the merged polygon traverses every part (reference
    converter.py:431-480 — identical protocol so converted label files are
    byte-comparable).
    """
    s = []
    segments = [np.array(i).reshape(-1, 2) for i in segments]
    idx_list: List[List[int]] = [[] for _ in range(len(segments))]

    for i in range(1, len(segments)):
        idx1, idx2 = min_index(segments[i - 1], segments[i])
        idx_list[i - 1].append(int(idx1))
        idx_list[i].append(int(idx2))

    for k in range(2):
        if k == 0:
            for i, idx in enumerate(idx_list):
                if len(idx) == 2 and idx[0] > idx[1]:
                    idx = idx[::-1]
                    segments[i] = segments[i][::-1, :]
                segments[i] = np.roll(segments[i], -idx[0], axis=0)
                segments[i] = np.concatenate([segments[i], segments[i][:1]])
                if i in (0, len(idx_list) - 1):
                    s.append(segments[i])
                else:
                    idx = [0, idx[1] - idx[0]]
                    s.append(segments[i][idx[0] : idx[1] + 1])
        else:
            for i in range(len(idx_list) - 1, -1, -1):
                if i not in (0, len(idx_list) - 1):
                    idx = idx_list[i]
                    nidx = abs(idx[1] - idx[0])
                    s.append(segments[i][nidx:])
    return s


def convert_coco(
    labels_dir: str = "../coco/annotations/",
    save_dir: str = "coco_converted/",
    use_segments: bool = False,
    use_keypoints: bool = False,
    cls91to80: bool = True,
) -> Path:
    """Convert COCO-JSON annotations to YOLO-txt label files.

    Reads every ``*.json`` in ``labels_dir``; writes one ``.txt`` per
    annotated image under ``save_dir/labels/<json-stem>/`` (the
    ``instances_`` prefix stripped, like the reference converter.py:208-318):
    ``cls cx cy w h`` rows normalized to [0,1], or polygon / keypoint rows
    when requested. Crowd and degenerate (w/h <= 0) annotations are skipped;
    duplicate boxes deduped.

    Returns the (auto-incremented) save directory.
    """
    from experiment_yolo_tpu.utils import increment_path

    save_dir = increment_path(Path(save_dir), exist_ok=False)
    for p in (save_dir / "labels", save_dir / "images"):
        p.mkdir(parents=True, exist_ok=True)
    coco80 = coco91_to_coco80_class()

    json_files = sorted(Path(labels_dir).resolve().glob("*.json"))
    if not json_files:
        raise FileNotFoundError(f"no COCO json files in {labels_dir}")
    for json_file in json_files:
        fn = save_dir / "labels" / json_file.stem.replace("instances_", "")
        fn.mkdir(parents=True, exist_ok=True)
        data = json.loads(json_file.read_text())

        images = {img["id"]: img for img in data["images"]}
        img_anns = defaultdict(list)
        for ann in data["annotations"]:
            img_anns[ann["image_id"]].append(ann)

        for img_id, anns in img_anns.items():
            img = images[img_id]
            h, w, f = img["height"], img["width"], img["file_name"]
            bboxes, segments, keypoints = [], [], []
            for ann in anns:
                if ann.get("iscrowd", 0):
                    continue
                box = np.array(ann["bbox"], dtype=np.float64)  # tlwh
                box[:2] += box[2:] / 2
                box[[0, 2]] /= w
                box[[1, 3]] /= h
                if box[2] <= 0 or box[3] <= 0:
                    continue
                if cls91to80:
                    cls = coco80[ann["category_id"] - 1]
                    if cls is None:
                        continue
                else:
                    cls = ann["category_id"] - 1
                row = [cls] + box.tolist()
                if row in bboxes:
                    continue
                bboxes.append(row)
                # segments/keypoints stay index-ALIGNED with bboxes: an
                # annotation missing the key appends a placeholder so later
                # rows never shift onto the wrong bbox (the upstream
                # converter misaligns here when keys are partially present)
                if use_segments:
                    seg = ann.get("segmentation")
                    if not seg:
                        segments.append([])
                    else:
                        if len(seg) > 1:
                            pts = np.concatenate(merge_multi_segment(seg), axis=0)
                        else:
                            pts = np.array(seg[0]).reshape(-1, 2)
                        segments.append([cls] + (pts / np.array([w, h])).reshape(-1).tolist())
                if use_keypoints:
                    if ann.get("keypoints") is None:
                        keypoints.append(None)
                    else:
                        kp = np.array(ann["keypoints"]).reshape(-1, 3) / np.array([w, h, 1])
                        keypoints.append(row + kp.reshape(-1).tolist())

            with open((fn / f).with_suffix(".txt"), "a") as file:
                for i in range(len(bboxes)):
                    if use_keypoints and keypoints[i] is not None:
                        line = keypoints[i]
                    elif use_segments and len(segments[i]) > 0:
                        line = segments[i]
                    else:
                        line = bboxes[i]
                    file.write(("%g " * len(line)).rstrip() % tuple(line) + "\n")
    return save_dir


# DOTA v1/v2 category names -> contiguous YOLO-OBB class ids
DOTA_CLASSES = {
    "plane": 0, "ship": 1, "storage-tank": 2, "baseball-diamond": 3,
    "tennis-court": 4, "basketball-court": 5, "ground-track-field": 6,
    "harbor": 7, "bridge": 8, "large-vehicle": 9, "small-vehicle": 10,
    "helicopter": 11, "roundabout": 12, "soccer-ball-field": 13,
    "swimming-pool": 14, "container-crane": 15, "airport": 16, "helipad": 17,
}


def convert_dota_to_yolo_obb(dota_root_path: str) -> None:
    """DOTA original annotations -> YOLO-OBB labels (converter.py:320-428).

    Expects ``images/{train,val}`` and ``labels/{train,val}_original``;
    writes normalized 8-coordinate polygon rows into ``labels/{train,val}``.
    """
    import cv2

    root = Path(dota_root_path)
    for phase in ("train", "val"):
        image_dir = root / "images" / phase
        orig_dir = root / "labels" / f"{phase}_original"
        save_dir = root / "labels" / phase
        save_dir.mkdir(parents=True, exist_ok=True)
        for image_path in sorted(image_dir.iterdir()):
            if image_path.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            img = cv2.imread(str(image_path))
            if img is None:
                raise FileNotFoundError(f"could not read image {image_path}")
            h, w = img.shape[:2]
            orig_label = orig_dir / f"{image_path.stem}.txt"
            out_lines = []
            if orig_label.exists():
                for line in orig_label.read_text().splitlines():
                    parts = line.strip().split()
                    if len(parts) < 9:
                        continue
                    cls = DOTA_CLASSES[parts[8]]
                    coords = [float(p) for p in parts[:8]]
                    norm = [c / w if i % 2 == 0 else c / h for i, c in enumerate(coords)]
                    out_lines.append(f"{cls} " + " ".join(f"{c:.6g}" for c in norm))
            (save_dir / f"{image_path.stem}.txt").write_text("\n".join(out_lines) + ("\n" if out_lines else ""))


def yolo_bbox2segment(im_dir, save_dir=None, sam_variant: str = "b", sam_variables=None):
    """Upgrade a detection dataset to segmentation via SAM (converter.py:483).

    For every label file next to ``im_dir`` the boxes are fed as prompts to
    our SAM (models/sam.py); resulting polygons are written to
    ``labels-segment``. ``sam_variables`` must be a loaded SAM checkpoint
    pytree — with None, boxes are converted to 4-corner polygons (a valid
    degenerate segmentation) so the tool works without SAM weights.
    """
    import cv2

    from experiment_yolo_tpu.data.dataset import img2label_path
    from experiment_yolo_tpu.ops.boxes import xywh2xyxy

    im_dir = Path(im_dir)
    save_dir = Path(save_dir) if save_dir else im_dir.parent / "labels-segment"
    save_dir.mkdir(parents=True, exist_ok=True)

    predictor = None
    if sam_variables is not None:
        from experiment_yolo_tpu.models.sam import SAMPredictor, build_sam

        predictor = SAMPredictor(build_sam(f"vit_{sam_variant}"), sam_variables)

    img_files = sorted(p for p in im_dir.iterdir() if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"))
    for im_file in img_files:
        lb_file = Path(img2label_path(str(im_file)))
        if not lb_file.exists():
            continue
        rows = np.array([x.split() for x in lb_file.read_text().split("\n") if x.strip()], dtype=np.float32)
        if rows.size == 0:
            continue
        img = cv2.imread(str(im_file))
        if img is None:
            raise FileNotFoundError(f"could not read image {im_file}")
        h, w = img.shape[:2]
        cls, boxes = rows[:, 0].astype(int), rows[:, 1:5]
        xyxy = np.asarray(xywh2xyxy(boxes * np.array([w, h, w, h], np.float32)))
        texts = []
        for ci, bb in zip(cls, xyxy):
            if predictor is not None:
                poly = predictor.segment_box(img, bb)  # (n,2) normalized
            else:
                x1, y1, x2, y2 = bb / np.array([w, h, w, h])
                poly = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]])
            line = (int(ci), *poly.reshape(-1).tolist())
            texts.append(("%g " * len(line)).rstrip() % line)
        (save_dir / lb_file.name).write_text("\n".join(texts) + "\n")
    return save_dir
