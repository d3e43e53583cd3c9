"""Deep-dive: why do near-identical det sets move their-stack mAP50 0.0059?

Re-runs stage A of parity_valdiff, then diffs the per-detection TP vectors
(their match_predictions) between REF dets and OUR dets, reporting every
flip with its IoU margin to the threshold — distinguishing borderline-IoU
chaos from a systematic matching difference. Also compares global conf
orderings feeding ap_per_class.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools" / "refstub"))
sys.path.insert(0, str(REF))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402


def main(argv):
    kv = dict(a.partition("=")[::2] for a in argv)
    ckpt = Path(kv.get("ckpt", REPO / "runs/parity_r5/train/yolov8n_synth/weights/best"))
    data_root = Path(kv.get("data", REPO / "runs/parity_r5/dataset"))
    imgsz = int(kv.get("imgsz", 320))
    n_max = int(kv.get("n", 512))
    conf_t, iou_t = 0.001, 0.7

    from ultralytics.engine.validator import BaseValidator
    from ultralytics.nn.tasks import DetectionModel as TDM
    from ultralytics.utils import ops as tops
    from ultralytics.utils.metrics import box_iou as t_box_iou

    from experiment_yolo_tpu.engine.checkpoint import load_checkpoint
    from experiment_yolo_tpu.ops import nms as our_nms
    from experiment_yolo_tpu.utils.torch_convert import invert_to_torch_state

    model, variables = load_checkpoint(ckpt)
    tmodel = TDM(str(REPO / "experiment_yolo_tpu/cfg/models/yolov8n.yaml"),
                 nc=model.nc, verbose=False)
    shapes = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    back = invert_to_torch_state(variables, shapes, model)
    tmodel.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in back.items()},
                           strict=False)
    tmodel = tmodel.float().eval()
    predict = jax.jit(model.predict)

    class _V:
        match_predictions = BaseValidator.match_predictions

    tv = _V()
    tv.iouv = torch.linspace(0.5, 0.95, 10)

    img_dir = data_root / "images" / "val"
    lab_dir = data_root / "labels" / "val"
    paths = sorted(img_dir.glob("*.jpg"))[:n_max]

    flips = 0
    margin_hist = []
    tp_ref_total = np.zeros(10, int)
    tp_our_total = np.zeros(10, int)
    for k, p in enumerate(paths):
        img = cv2.imread(str(p))[..., ::-1]
        x = img[None].astype(np.float32) / 255.0
        t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            raw_t = tmodel(t)[0]
        det_t = tops.non_max_suppression(raw_t, conf_t, iou_t, multi_label=True,
                                         max_det=300)[0].numpy()
        boxes_o, scores_o = predict(variables, jnp.asarray(x))
        det_o, cnt = our_nms.non_max_suppression(
            boxes_o, scores_o, conf_thres=conf_t, iou_thres=iou_t, max_det=300,
            multi_label=True, pre_nms_topk=4096, nms_type="soft",
            soft_first_quirk=True)
        det_o = np.asarray(det_o[0])[: int(cnt[0])]

        lab = np.loadtxt(lab_dir / (p.stem + ".txt"), ndmin=2)
        gt_c = torch.from_numpy(lab[:, 0].astype(np.float32))
        xywh = lab[:, 1:5] * imgsz
        gt_b = torch.from_numpy(np.stack(
            [xywh[:, 0] - xywh[:, 2] / 2, xywh[:, 1] - xywh[:, 3] / 2,
             xywh[:, 0] + xywh[:, 2] / 2, xywh[:, 1] + xywh[:, 3] / 2],
            1).astype(np.float32))

        def their_tp(det):
            dt = torch.from_numpy(np.asarray(det, np.float32))
            if len(det) == 0:
                return np.zeros((0, 10), bool), None
            iou = t_box_iou(gt_b, dt[:, :4])
            return tv.match_predictions(dt[:, 5], gt_c, iou).numpy(), iou.numpy()

        tp_r, iou_r = their_tp(det_t)
        tp_o, iou_o = their_tp(det_o)
        tp_ref_total += tp_r.sum(0)
        tp_our_total += tp_o.sum(0)
        if tp_r.shape == tp_o.shape and not np.array_equal(tp_r, tp_o):
            # align rows by conf-sorted order to compare like-for-like
            d = np.argwhere(tp_r != tp_o)
            for (ri, ti) in d[:4]:
                # margin of the best same-class IoU to the flipped threshold
                thr = 0.5 + 0.05 * ti
                cls_ok = gt_c.numpy() == det_t[ri, 5]
                best_r = (iou_r[cls_ok, ri].max() if cls_ok.any() else 0.0)
                best_o = (iou_o[cls_ok, ri].max() if cls_ok.any() else 0.0)
                margin_hist.append(min(abs(best_r - thr), abs(best_o - thr)))
            flips += len(d)
            if flips < 30 and len(d):
                print(f"[{p.name}] {len(d)} tp flips; first at det {d[0][0]} "
                      f"thr {0.5 + 0.05 * d[0][1]:.2f} conf {det_t[d[0][0], 4]:.4f}")
        if (k + 1) % 128 == 0:
            print(f"  .. {k + 1}/{len(paths)}")

    print(f"\ntotal tp flips: {flips}")
    print(f"tp@thresholds REF: {tp_ref_total.tolist()}")
    print(f"tp@thresholds OUR: {tp_our_total.tolist()}")
    if margin_hist:
        m = np.asarray(margin_hist)
        print(f"flip margins: median {np.median(m):.2e} p90 {np.quantile(m, 0.9):.2e} "
              f"max {m.max():.2e}")


if __name__ == "__main__":
    main(sys.argv[1:])
