"""SAM auto-annotation (reference: ultralytics/data/annotator.py:1-50).

Runs our YOLO detector over an image folder, prompts our SAM with each
detection box, and writes YOLO segmentation label files.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["auto_annotate"]


def auto_annotate(data, det_model, det_variables, sam_variables=None,
                  sam_variant: str = "b", output_dir=None, conf: float = 0.25):
    """Annotate every image in ``data`` with class + polygon rows.

    Args:
        data: image folder.
        det_model / det_variables: our DetectionModel + loaded weights.
        sam_variables: loaded SAM checkpoint pytree; when None the boxes are
            written as 4-corner polygons (degenerate but valid segments),
            so the tool runs without SAM weights.
        output_dir: defaults to ``<data>_auto_annotate_labels`` next to data.

    Writes one ``.txt`` per image with ``cls x1 y1 x2 y2 ...`` normalized
    polygon rows (same contract as the reference annotator.py:38-50).
    """
    import cv2

    from experiment_yolo_tpu.engine.predictor import DetectionPredictor

    data = Path(data)
    output_dir = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    output_dir.mkdir(parents=True, exist_ok=True)

    predictor = DetectionPredictor(det_model, det_variables, overrides={"conf": conf})
    sam_pred = None
    if sam_variables is not None:
        from experiment_yolo_tpu.models.sam import SAMPredictor, build_sam

        sam_pred = SAMPredictor(build_sam(f"vit_{sam_variant}"), sam_variables)

    results = predictor(str(data))
    for result in results:
        det = result.boxes.data  # (n, 6) xyxy px, conf, cls
        if det.shape[0] == 0:
            continue
        h, w = result.orig_shape  # no decode needed for the box-only path
        img = None
        if sam_pred is not None:
            img = cv2.imread(result.path)
            if img is None:
                raise FileNotFoundError(f"could not read image {result.path}")
        lines = []
        for row in det:
            cls = int(row[5])
            if sam_pred is not None:
                poly = sam_pred.segment_box(img, row[:4])
            else:
                x1, y1, x2, y2 = row[:4] / np.array([w, h, w, h], np.float32)
                poly = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)
            if poly.size == 0:
                continue
            lines.append(f"{cls} " + " ".join(map(str, poly.reshape(-1).tolist())))
        if lines:
            (output_dir / f"{Path(result.path).stem}.txt").write_text("\n".join(lines) + "\n")
    return output_dir
