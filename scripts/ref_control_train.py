"""Reference-side CONTROL training run (VERDICT r4 item 2).

Trains the REFERENCE'S OWN torch model (stock `ultralytics.models.yolo.detect`
trainer from /root/reference, CPU) on the identical on-disk synthetic parity
dataset, so "our LD-P2 training collapses" can be separated from "LD-P2 is
weak on this dataset". Writes the reference's results.csv mAP curve next to
ours for comparison.

Per-epoch 512-image torch-CPU val is unaffordable on 1 core, so validate()
is wrapped to run every ``val_every`` epochs (plus the final epoch) — the
curve is a step function but the convergence trend is what matters.

Usage:
    python scripts/ref_control_train.py [cfg=yolov8-LD-P2.yaml] [epochs=60]
        [imgsz=320] [batch=16] [val_every=5]
        [data=runs/parity_r5/dataset/data.yaml] [root=runs/control_r5]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO / "tools" / "refstub"))
sys.path.insert(0, str(REF))
sys.path.insert(0, str(REPO))


def main(argv):
    import torch

    # torch>=2.6 defaults weights_only=True; the reference's own ckpts pickle
    # its DetectionModel class (trainer.py:1042 strip_optimizer). Our run
    # produced these files — trusted.
    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load

    kv = dict(a.partition("=")[::2] for a in argv)
    cfg = kv.get("cfg", "yolov8-LD-P2.yaml")
    epochs = int(kv.get("epochs", 60))
    imgsz = int(kv.get("imgsz", 320))
    batch = int(kv.get("batch", 16))
    val_every = int(kv.get("val_every", 5))
    data = REPO / kv.get("data", "runs/parity_r5/dataset/data.yaml")
    root = REPO / kv.get("root", "runs/control_r5")

    from ultralytics.models.yolo.detect import DetectionTrainer as TorchTrainer

    ref_yaml = REF / "ultralytics" / "cfg" / "models" / cfg
    if not ref_yaml.exists():
        ref_yaml = REPO / "experiment_yolo_tpu" / "cfg" / "models" / cfg

    orig_validate = TorchTrainer.validate

    def sparse_validate(self):
        e = self.epoch + 1
        if e % val_every and e != self.epochs and getattr(self, "metrics", None):
            return self.metrics, self.fitness  # reuse last real val (step curve)
        return orig_validate(self)

    TorchTrainer.validate = sparse_validate

    extra = {}
    for key in ("mosaic", "scale", "translate", "fliplr", "hsv_h", "hsv_s", "hsv_v"):
        if key in kv:
            extra[key] = float(kv[key])
    t = TorchTrainer(
        overrides=dict(
            **extra,
            model=str(ref_yaml),
            data=str(data),
            epochs=epochs,
            imgsz=imgsz,
            batch=batch,
            device="cpu",
            workers=0,
            optimizer="SGD",
            lr0=0.01,
            plots=False,
            save=True,
            val=True,
            rect=False,
            project=str(root / "train"),
            name=f"{Path(cfg).stem}_ref_control",
            exist_ok=True,
            verbose=False,
        )
    )
    t.train()
    print(f"[control] done; curve at {t.save_dir / 'results.csv'}")


if __name__ == "__main__":
    main(sys.argv[1:])
