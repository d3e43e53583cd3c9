"""Stage-by-stage parity diagnosis vs the torch reference (VERDICT r2 item 2).

Loads the trained parity checkpoint into BOTH frameworks (weights bit-equal),
then on each reference asset compares, stage by stage:
  1. letterboxed input tensor (bit compare)
  2. raw fused head output (pre-NMS (4+nc, n_anchors) tensor)
  3. NMS survivors (count, boxes, conf)
  4. rescaled final boxes
Prints max-abs diffs per stage so the first diverging stage is obvious.

Usage: python scripts/parity_diag.py [ckpt=runs/parity/train/yolov8n_synth/weights/best]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools" / "refstub"))
sys.path.insert(0, str(REF))

import cv2
import numpy as np
import torch


def main(argv):
    import jax

    # torch CPU is exact f32; TPU f32 convs default to bf16 passes (~5e-3
    # rel), which would mask real divergences behind precision noise
    jax.config.update("jax_default_matmul_precision", "highest")
    kv = dict(a.partition("=")[::2] for a in argv)
    ckpt = Path(kv.get("ckpt", REPO / "runs/parity/train/yolov8n_synth/weights/best"))

    from ultralytics.data.augment import LetterBox
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel
    from ultralytics.utils import ops as tops

    from experiment_yolo_tpu.engine.checkpoint import load_checkpoint
    from experiment_yolo_tpu.utils.torch_convert import invert_to_torch_state

    model, variables = load_checkpoint(ckpt)
    tmodel = TorchDetectionModel(
        str(REPO / "experiment_yolo_tpu/cfg/models/yolov8n.yaml"), nc=model.nc, verbose=False
    )
    shapes = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    back = invert_to_torch_state(variables, shapes, model)
    tmodel.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in back.items()}, strict=False)
    tmodel = tmodel.float().eval()

    imgsz, conf, iou = 640, 0.25, 0.7

    from experiment_yolo_tpu.data.augment import letterbox as our_letterbox
    from experiment_yolo_tpu.ops import nms as our_nms

    import jax
    import jax.numpy as jnp

    for img_path in sorted((REF / "assets").glob("*.jpg")):
        orig = cv2.imread(str(img_path))
        print(f"\n=== {img_path.name} orig={orig.shape} ===")

        # --- stage 1: letterbox ---
        lb = LetterBox((imgsz, imgsz), auto=False, stride=32)
        ref_im = lb(image=orig)  # HWC BGR uint8
        our_im, ratio, pad = our_letterbox(orig, (imgsz, imgsz))
        if ref_im.shape != our_im.shape:
            print(f"  [1 letterbox] SHAPE MISMATCH ref={ref_im.shape} ours={our_im.shape}")
        else:
            d = np.abs(ref_im.astype(np.int32) - our_im.astype(np.int32))
            print(f"  [1 letterbox] max abs diff={d.max()} npix_diff={(d>0).sum()}")

        # --- stage 2: raw head output on the SAME tensor (ref letterbox both sides) ---
        rgb = ref_im[..., ::-1]
        t = torch.from_numpy(np.ascontiguousarray(rgb.transpose(2, 0, 1))).float()[None] / 255.0
        with torch.no_grad():
            ref_raw = tmodel(t)[0].numpy()  # (1, 4+nc, n)
        x = jnp.asarray(rgb[None].astype(np.float32) / 255.0)
        boxes_o, scores_o = jax.jit(model.predict)(variables, x)
        boxes_o = np.asarray(boxes_o)[0]   # (n, 4) xyxy or xywh?
        scores_o = np.asarray(scores_o)[0]  # (n, nc)
        ref_raw = ref_raw[0]  # (4+nc, n)
        ref_boxes = ref_raw[:4].T  # xywh center format
        ref_scores = ref_raw[4:].T
        n = min(len(boxes_o), ref_boxes.shape[0])
        db = np.abs(boxes_o[:n] - ref_boxes[:n])
        ds = np.abs(scores_o[:n] - ref_scores[:n])
        print(f"  [2 raw head] n_ref={ref_boxes.shape[0]} n_ours={len(boxes_o)} "
              f"box max={db.max():.3e} mean={db.mean():.3e}  score max={ds.max():.3e} mean={ds.mean():.3e}")
        # where do big box diffs live?
        if db.max() > 1e-2:
            i = int(np.unravel_index(np.argmax(db), db.shape)[0])
            print(f"    worst anchor {i}: ref={ref_boxes[i]} ours={boxes_o[i]}")

        # --- stage 3: NMS on the REFERENCE raw output through both NMS impls ---
        # NOTE: the fork's non_max_suppression mutates its input IN PLACE
        # (xywh2xyxy write-through + soft_nms score decay) — copy, or
        # ref_boxes/ref_scores (views of ref_raw) get corrupted.
        pred_t = torch.from_numpy(ref_raw.copy()[None])
        det_t = tops.non_max_suppression(pred_t, conf, iou, max_det=300)[0].numpy()
        # ours, fed the same raw decode (xywh)
        det_o, cnt = our_nms.non_max_suppression(
            jnp.asarray(ref_boxes[None]), jnp.asarray(ref_scores[None]),
            conf_thres=conf, iou_thres=iou, max_det=300, in_xywh=True,
            nms_type="soft", soft_first_quirk=True)
        det_o = np.asarray(det_o[0])[: int(cnt[0])]
        print(f"  [3 NMS same raw] ref {det_t.shape[0]} dets, ours {det_o.shape[0]} dets")
        ref_sorted = det_t[np.argsort(-det_t[:, 4])][:10]
        our_sorted = det_o[np.argsort(-det_o[:, 4])][:10]
        for i in range(min(len(ref_sorted), len(our_sorted), 6)):
            r, o = ref_sorted[i], our_sorted[i]
            print(f"    #{i} ref conf={r[4]:.4f} cls={int(r[5])} box={r[:4].round(1)} | "
                  f"our conf={o[4]:.4f} cls={int(o[5])} box={o[:4].round(1)}")


if __name__ == "__main__":
    main(sys.argv[1:])
