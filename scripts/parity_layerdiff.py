"""Per-layer forward divergence: ours (flax/CPU fp32) vs reference torch CPU.

Same weights (inverted checkpoint), same input (ref-letterboxed bus.jpg).
Prints max-abs / rel diff per layer index so the first diverging layer is
obvious. NCHW(torch) vs NHWC(ours) transposed for comparison.

Usage: python scripts/parity_layerdiff.py [ckpt=...] [img=bus.jpg]
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
    # rel), which reads as a fake layer-0 divergence (round-5 lesson)
    jax.config.update("jax_default_matmul_precision", "highest")

    kv = dict(a.partition("=")[::2] for a in argv)
    ckpt = Path(kv.get("ckpt", REPO / "runs/parity/train/yolov8n_synth/weights/best"))
    img_name = kv.get("img", "bus.jpg")

    from ultralytics.data.augment import LetterBox
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

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

    orig = cv2.imread(str(REF / "assets" / img_name))
    lb = LetterBox((640, 640), auto=False, stride=32)
    rgb = lb(image=orig)[..., ::-1]
    t = torch.from_numpy(np.ascontiguousarray(rgb.transpose(2, 0, 1))).float()[None] / 255.0

    # torch per-layer outputs via hooks
    touts = {}

    def mk_hook(i):
        def hook(_m, _inp, out):
            touts[i] = out
        return hook

    for i, m in enumerate(tmodel.model):
        m.register_forward_hook(mk_hook(i))
    with torch.no_grad():
        tmodel(t)

    import jax
    import jax.numpy as jnp

    n_layers = len(tmodel.model)
    x = jnp.asarray(rgb[None].astype(np.float32) / 255.0)
    capture = tuple(range(n_layers))
    _, feats = model.module.apply(variables, x, False, capture=capture)

    for i in range(n_layers):
        ttype = type(tmodel.model[i]).__name__
        to = touts.get(i)
        fo = feats[i]
        if isinstance(to, (list, tuple)) or isinstance(fo, (list, tuple)):
            # multi-output (e.g. Detect raw): compare elementwise where shapes align
            tos = to if isinstance(to, (list, tuple)) else [to]
            fos = fo if isinstance(fo, (list, tuple)) else [fo]
            msgs = []
            for j, (a, b) in enumerate(zip(tos, fos)):
                if not torch.is_tensor(a):
                    continue
                a = a.numpy()
                b = np.asarray(b)
                if a.ndim == 4 and b.ndim == 4 and a.shape[1] == b.shape[-1]:
                    a = a.transpose(0, 2, 3, 1)
                if a.shape != b.shape:
                    msgs.append(f"[{j}] shape {a.shape} vs {b.shape}")
                    continue
                d = np.abs(a - b)
                msgs.append(f"[{j}] max={d.max():.3e} mean={d.mean():.3e}")
            print(f"L{i:2d} {ttype:18s} " + " ".join(msgs))
            continue
        a = to.numpy()
        b = np.asarray(fo)
        if a.ndim == 4 and b.ndim == 4 and a.shape[1] == b.shape[-1]:
            a = a.transpose(0, 2, 3, 1)
        if a.shape != b.shape:
            print(f"L{i:2d} {ttype:18s} SHAPE {a.shape} vs {b.shape}")
            continue
        d = np.abs(a - b)
        scale = np.abs(a).max() + 1e-9
        print(f"L{i:2d} {ttype:18s} max={d.max():.3e} mean={d.mean():.3e} rel_max={d.max()/scale:.3e}")


if __name__ == "__main__":
    main(sys.argv[1:])
