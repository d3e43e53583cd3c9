"""Lockstep single-batch training: ours vs torch from IDENTICAL weights.

The LD-P2 control converges (mAP50 0.44) while our runs stall at box~3.7 —
per-layer forward/grad parity is proven, so the divergence must appear in
the training LOOP. This script removes every other variable: both
frameworks start from the SAME weights (ours inverted into torch), see the
SAME fixed batch every step, and use plain SGD (lr constant, no momentum,
no decay, no EMA, no warmup). Prints both loss trajectories and the
per-layer parameter drift after N steps — the first layer whose weights
separate is the bug.

Usage: python scripts/train_lockstep.py [cfg=yolov8-LD-P2.yaml] [steps=30]
       [lr=0.01] [imgsz=320] [batch=8] (CPU, f32-highest)
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
    cfg = kv.get("cfg", "yolov8-LD-P2.yaml")
    steps = int(kv.get("steps", 30))
    lr = float(kv.get("lr", 0.01))
    imgsz = int(kv.get("imgsz", 320))
    bs = int(kv.get("batch", 8))

    from ultralytics.nn.tasks import DetectionModel as TDM
    from ultralytics.utils.loss import v8DetectionLoss

    from experiment_yolo_tpu.nn.tasks import DetectionModel
    from experiment_yolo_tpu.utils.loss import LossConfig, detection_loss
    from experiment_yolo_tpu.utils.torch_convert import invert_to_torch_state

    # ---- shared fixed batch from the parity dataset ----
    img_dir = REPO / "runs/parity_r5/dataset/images/train"
    lab_dir = REPO / "runs/parity_r5/dataset/labels/train"
    paths = sorted(img_dir.glob("*.jpg"))[:bs]
    imgs = np.stack([cv2.imread(str(p))[..., ::-1] for p in paths]).astype(np.float32) / 255.0
    labs = [np.loadtxt(lab_dir / (p.stem + ".txt"), ndmin=2).astype(np.float32) for p in paths]

    # ---- ours ----
    model = DetectionModel(cfg, nc=3)
    variables = model.init(jax.random.PRNGKey(0))

    nl_max = max(len(l) for l in labs)
    bboxes = np.zeros((bs, nl_max, 4), np.float32)
    clses = np.zeros((bs, nl_max), np.int32)
    mask = np.zeros((bs, nl_max), bool)
    for i, l in enumerate(labs):
        bboxes[i, : len(l)] = l[:, 1:5]
        clses[i, : len(l)] = l[:, 0]
        mask[i, : len(l)] = True
    our_batch = {
        "img": jnp.asarray(imgs),
        "bboxes": jnp.asarray(bboxes),
        "cls": jnp.asarray(clses),
        "mask": jnp.asarray(mask),
    }

    cfg_loss = LossConfig(nc=3, reg_max=model.reg_max)

    @jax.jit
    def step_fn(params, batch_stats):
        def lf(p):
            out, mut = model.module.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["img"], True, mutable=["batch_stats"])
            total, comps, _ = detection_loss(out, batch, model.strides, cfg_loss)
            return total, (comps, mut["batch_stats"])
        (total, (comps, new_bs)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        new_params = jax.tree.map(lambda w, g: w - lr * g, params, grads)
        return new_params, new_bs, total, comps

    # ---- torch ----
    ref_yaml = REF / "ultralytics" / "cfg" / "models" / cfg
    if not ref_yaml.exists():
        ref_yaml = REPO / "experiment_yolo_tpu" / "cfg" / "models" / cfg
    tmodel = TDM(str(ref_yaml), nc=3, verbose=False)
    shapes = {k: tuple(v.shape) for k, v in tmodel.state_dict().items()}
    back = invert_to_torch_state(variables, shapes, model)
    res = tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in back.items()}, strict=False)
    assert not res.unexpected_keys
    tmodel = tmodel.float().train()
    tmodel.args = type("A", (), {"box": 7.5, "cls": 0.5, "dfl": 1.5})()
    tcrit = v8DetectionLoss(tmodel)

    bidx = np.concatenate([np.full(len(l), i, np.float32) for i, l in enumerate(labs)])
    tbatch = {
        "batch_idx": torch.from_numpy(bidx),
        "cls": torch.from_numpy(np.concatenate([l[:, :1] for l in labs])),
        "bboxes": torch.from_numpy(np.concatenate([l[:, 1:5] for l in labs])),
    }
    timg = torch.from_numpy(imgs.transpose(0, 3, 1, 2).copy())
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.0, weight_decay=0.0)

    batch = our_batch
    params, bstats = variables["params"], variables["batch_stats"]
    print(f"{'step':>4} {'ours_total':>11} {'torch_total':>11}  (per-image scale)")
    for s in range(steps):
        params, bstats, total, comps = step_fn(params, bstats)
        opt.zero_grad()
        preds = tmodel(timg)
        tloss, _ = tcrit(preds, tbatch)
        tloss = tloss.sum()
        tloss.backward()
        opt.step()
        print(f"{s:4d} {float(total) / bs:11.4f} {float(tloss) / bs:11.4f}", flush=True)

    # per-layer drift: ours-final vs torch-final (same naming via inverter)
    back2 = invert_to_torch_state({"params": params, "batch_stats": bstats}, shapes, model)
    tsd = tmodel.state_dict()
    drift = []
    for k, v in back2.items():
        if k not in tsd:
            continue
        t = tsd[k].detach().numpy()
        o = np.asarray(v)
        if o.shape != t.shape:
            continue
        d = float(np.abs(o - t).max())
        scale = float(np.abs(t).max()) + 1e-9
        drift.append((d / scale, d, k))
    drift.sort(reverse=True)
    print("\nlargest relative weight drift after lockstep:")
    for rel, d, k in drift[:15]:
        print(f"  rel={rel:.3e} abs={d:.3e}  {k}")


if __name__ == "__main__":
    main(sys.argv[1:])
