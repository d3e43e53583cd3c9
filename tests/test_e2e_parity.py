"""End-to-end parity vs the PyTorch reference beyond raw head outputs.

Two layers on top of tests/test_torch_parity.py:
1. the weight converter roundtrips bit-exactly (flax -> torch inverts
   torch -> flax), so trained weights can be evaluated by the reference's
   own val pipeline (scripts/e2e_parity.py, PARITY.md);
2. with identical weights, each framework's FULL predict pipeline
   (letterbox -> forward -> decode -> NMS -> rescale) produces the same
   boxes on the reference's assets images.

Reference code exercised: ultralytics/utils/ops.py:non_max_suppression,
scale_boxes; ultralytics/data/augment.py:LetterBox.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
STUB = Path(__file__).resolve().parents[1] / "tools" / "refstub"
OUR_V8N = Path(__file__).resolve().parents[1] / "experiment_yolo_tpu" / "cfg" / "models" / "yolov8n.yaml"

pytestmark = pytest.mark.skipif(not REF.exists(), reason="torch reference not mounted")


@pytest.fixture(scope="module")
def torch_env():
    sys.path.insert(0, str(STUB))
    sys.path.insert(0, str(REF))
    import torch

    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    return torch, TorchDetectionModel


@pytest.mark.slow
def test_weight_roundtrip_exact(torch_env):
    torch, TDM = torch_env
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils.torch_convert import convert_state_dict, invert_to_torch_state

    torch.manual_seed(0)
    tmodel = TDM(str(OUR_V8N), verbose=False).eval()
    state = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    ours = DetectionModel("yolov8n.yaml")
    variables = convert_state_dict(state, ours)
    back = invert_to_torch_state(variables, {k: tuple(v.shape) for k, v in state.items()}, ours)
    real_keys = [
        k
        for k in state
        if "num_batches_tracked" not in k and ".dfl." not in k and not k.endswith(".p_n")
    ]
    assert set(back) == set(real_keys)
    for k in real_keys:
        assert np.array_equal(back[k], state[k].astype(np.float32)), k


@pytest.mark.slow
def test_full_pipeline_box_agreement(torch_env):
    """Same weights -> same final boxes through each framework's whole
    predict pipeline on a real photo."""
    torch, TDM = torch_env
    import cv2

    from ultralytics.data.augment import LetterBox
    from ultralytics.utils import ops as tops

    from experiment_yolo_tpu.engine.predictor import DetectionPredictor
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils.torch_convert import convert_state_dict

    torch.manual_seed(3)
    tmodel = TDM(str(OUR_V8N), verbose=False).eval()
    # lift the class-prob floor so random weights yield confident, well
    # separated scores (stable NMS on both sides)
    with torch.no_grad():
        for m in tmodel.model[-1].cv3:
            m[-1].bias += 12.0
    state = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    ours = DetectionModel("yolov8n.yaml")
    variables = convert_state_dict(state, ours)

    img_path = REF / "assets" / "bus.jpg"
    orig = cv2.imread(str(img_path))
    conf, iou, imgsz = 0.4, 0.7, 640

    lb = LetterBox((imgsz, imgsz), auto=False, stride=32)
    im = lb(image=orig)[..., ::-1].transpose(2, 0, 1)
    t = torch.from_numpy(np.ascontiguousarray(im)).float()[None] / 255.0
    with torch.no_grad():
        pred = tmodel(t)[0]
    det_t = tops.non_max_suppression(pred, conf, iou, max_det=100)[0]
    det_t[:, :4] = tops.scale_boxes(t.shape[2:], det_t[:, :4], orig.shape)
    det_t = det_t.numpy()

    pr = DetectionPredictor(ours, variables, overrides={"conf": conf, "iou": iou, "imgsz": imgsz, "batch": 1, "max_det": 100})
    det_o = pr(str(img_path))[0].boxes.data

    assert len(det_t) > 3, "random-weight setup produced no detections"
    # counts may differ by one straggler at the conf boundary
    assert abs(len(det_t) - len(det_o)) <= max(1, len(det_t) // 10)
    matched = 0
    for b in det_t:
        xx1 = np.maximum(b[0], det_o[:, 0])
        yy1 = np.maximum(b[1], det_o[:, 1])
        xx2 = np.minimum(b[2], det_o[:, 2])
        yy2 = np.minimum(b[3], det_o[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a1 = (b[2] - b[0]) * (b[3] - b[1])
        a2 = (det_o[:, 2] - det_o[:, 0]) * (det_o[:, 3] - det_o[:, 1])
        iou_v = inter / (a1 + a2 - inter + 1e-9)
        ok = (iou_v > 0.95) & (det_o[:, 5].astype(int) == int(b[5])) & (np.abs(det_o[:, 4] - b[4]) < 5e-3)
        matched += bool(ok.any())
    assert matched >= int(0.9 * len(det_t)), f"{matched}/{len(det_t)} matched"
