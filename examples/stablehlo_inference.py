"""Standalone StableHLO consumer demo.

Loads a ``model.export('stablehlo')`` artifact with nothing but jax
(``jax.export.deserialize``) — the portable XLA-runtime deployment path
(servers, IREE, PJRT plugins). This file deliberately avoids importing the
framework: it is what a downstream consumer's service would contain.

Usage:
    python examples/stablehlo_inference.py model.stablehlo image.jpg [conf=0.25]
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    path, img_path = argv[0], argv[1]
    conf = float(dict(a.partition("=")[::2] for a in argv[2:]).get("conf", 0.25))

    import jax
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    (b, size, _, _), = [tuple(a.shape) for a in exported.in_avals][:1]

    orig = cv2.imread(img_path)
    h, w = orig.shape[:2]
    r = min(size / h, size / w)
    nw, nh = int(round(w * r)), int(round(h * r))
    canvas = np.full((size, size, 3), 114, np.uint8)
    top, left = (size - nh) // 2, (size - nw) // 2
    canvas[top : top + nh, left : left + nw] = cv2.resize(orig, (nw, nh))
    batch = np.repeat(canvas[..., ::-1][None], b, axis=0)

    boxes, scores = exported.call(batch)
    boxes, scores = np.asarray(boxes)[0], np.asarray(scores)[0]
    best, cls = scores.max(-1), scores.argmax(-1)
    m = best > conf
    print(f"{int(m.sum())} raw detections above conf {conf}")
    for bb, ci, si in sorted(zip(boxes[m], cls[m], best[m]), key=lambda t: -t[2])[:10]:
        cx, cy, bw, bh = (np.asarray(bb) - [left, top, 0, 0]) / r
        print(f"  cls={int(ci)} conf={si:.3f} cxcywh=({cx:.0f},{cy:.0f},{bw:.0f},{bh:.0f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
