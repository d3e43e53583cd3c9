"""Port an Ultralytics PyTorch checkpoint (.pt) into a framework checkpoint.

Counterpart of the reference's weight-loading path for cross-framework
migration: users with DEAL-YOLO / YOLOv8 `.pt` weights convert them once
and run everything here (predict/val/track/export) on TPU.

Usage:
    python scripts/port_torch_weights.py pt=<weights.pt> model=<config.yaml> out=<ckpt_dir>

The model yaml must match the checkpoint's architecture (parameter-exact
configs ship in experiment_yolo_tpu/cfg/models). Forward parity of the
conversion is covered by tests/test_torch_parity.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from experiment_yolo_tpu.cfg.cli import parse_key_value
from experiment_yolo_tpu.engine.checkpoint import save_checkpoint
from experiment_yolo_tpu.nn.tasks import DetectionModel
from experiment_yolo_tpu.utils import LOGGER
from experiment_yolo_tpu.utils.torch_convert import convert_state_dict


def main(argv):
    kv = parse_key_value(argv)
    import torch

    # weights_only=False unpickles arbitrary code — only port checkpoints you
    # trust (Ultralytics .pt files store full nn.Module objects, so the safe
    # loader cannot read them).
    ckpt = torch.load(kv["pt"], map_location="cpu", weights_only=False)
    tmodel = (ckpt.get("ema") or ckpt["model"]) if isinstance(ckpt, dict) else ckpt
    tmodel = tmodel.float()
    state = {k: v.detach().cpu().numpy().astype(np.float32) for k, v in tmodel.state_dict().items()}
    names = getattr(tmodel, "names", None)

    ours = DetectionModel(kv["model"])
    variables = convert_state_dict(state, ours)
    if names:
        ours.names = dict(names) if isinstance(names, dict) else dict(enumerate(names))
    out = kv.get("out", "ported_ckpt")
    save_checkpoint(out, ours, variables, meta={"names": ours.names, "ported_from": str(kv["pt"])})
    LOGGER.info(f"ported {kv['pt']} -> {out} ({ours.num_params(variables):,} params)")


if __name__ == "__main__":
    main(sys.argv[1:])
