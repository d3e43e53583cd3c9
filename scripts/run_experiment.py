"""The fork's headline experiment, end-to-end on TPU: DEAL-YOLO vs baseline.

TPU counterpart of the reference's ``testandcox.py`` (its :253-307 stats
block) driven over models trained HERE: multi-seed training of the DEAL
flagships (WIoU+NWD box loss, the paper's loss recipe) against vanilla
yolov8n on the shared synthetic dataset, then the reference's exact
bootstrap protocol — 30 subsamples of 50% of the val set, per-subsample
mAP50 pairs, Shapiro / paired t / Wilcoxon / t+bootstrap CIs / Cohen's d
(utils/stats.py). Writes EXPERIMENTS.md.

Usage:
    python scripts/run_experiment.py [seeds=0,1,2] [epochs=40] [imgsz=320]
        [batch=16] [n_train=128] [n_val=256] [root=runs/experiment]
        [deal=yolov8-LD-P2.yaml,yolov8-ASF-P2P2.yaml] [base=yolov8n.yaml]

Re-running reuses finished checkpoints (runs are keyed by cfg+seed), so an
interrupted sweep resumes where it stopped.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

from compare_models import map50_of_subset, per_image_stats
from experiment_yolo_tpu import YOLO
from experiment_yolo_tpu.cfg.cli import parse_key_value
from experiment_yolo_tpu.data import make_synthetic_dataset
from experiment_yolo_tpu.data.dataset import YOLODataset
from experiment_yolo_tpu.utils import LOGGER
from experiment_yolo_tpu.utils.stats import bootstrap_indices, compare_scores

# the DEAL paper's loss recipe: Wise-IoU v3 focusing + NWD blending
# (reference utils/loss.py BboxLoss branches; the fork ships them hard-coded
# off — utils/loss.py:128-149 — so this experiment is the configuration the
# paper describes, runnable here as plain config keys)
DEAL_LOSS = {"use_wiseiou": True, "wiou_ltype": "WIoU", "nwd": True, "iou_ratio": 0.5}


def train_one(cfg: str, seed: int, data_yaml: Path, root: Path, epochs: int,
              imgsz: int, batch: int, deal_loss: bool):
    name = f"{Path(cfg).stem}_s{seed}"
    ckpt = root / "train" / name / "weights" / "best"
    if (ckpt / "train_state").exists() or (ckpt.parent / "best" / "meta.yaml").exists() or (ckpt / "meta.yaml").exists():
        LOGGER.info(f"experiment: reusing finished run {name}")
        return ckpt
    t0 = time.time()
    m = YOLO(cfg, nc=3, seed=seed)  # 3-class synthetic dataset
    m.train(
        data=str(data_yaml), epochs=epochs, imgsz=imgsz, batch=batch,
        seed=seed, optimizer="SGD", lr0=0.01, val=True, save=True,
        project=str(root / "train"), name=name, exist_ok=True, plots=False,
        **(DEAL_LOSS if deal_loss else {}),
    )
    LOGGER.info(f"experiment: trained {name} in {time.time() - t0:.0f}s")
    return ckpt


def full_val(ckpt: Path, data_yaml: Path, imgsz: int) -> dict:
    m = YOLO(str(ckpt))
    r = m.val(data=str(data_yaml), imgsz=imgsz, batch=8, plots=False, verbose=False)
    return {k: float(v) for k, v in r.items() if isinstance(v, (int, float))}


def main(argv):
    kv = parse_key_value(argv)
    raw_seeds = kv.get("seeds", "0,1,2")
    if isinstance(raw_seeds, (list, tuple)):
        seeds = [int(s) for s in raw_seeds]
    else:
        seeds = [int(s) for s in str(raw_seeds).split(",")]
    epochs = int(kv.get("epochs", 40))
    imgsz = int(kv.get("imgsz", 320))
    batch = int(kv.get("batch", 16))
    n_train = int(kv.get("n_train", 128))
    n_val = int(kv.get("n_val", 256))
    root = Path(str(kv.get("root", "runs/experiment")))
    if not root.is_absolute():
        root = REPO / root
    deal_cfgs = str(kv.get("deal", "yolov8-LD-P2.yaml,yolov8-ASF-P2P2.yaml")).split(",")
    base_cfg = str(kv.get("base", "yolov8n.yaml"))
    root.mkdir(parents=True, exist_ok=True)

    data_yaml = make_synthetic_dataset(root / "dataset", n_train=n_train,
                                       n_val=n_val, imgsz=imgsz, seed=11)
    val_dir = data_yaml.parent / "images" / "val"
    ds = YOLODataset(val_dir, imgsz=imgsz, augment=False)

    # --- train the grid (baseline + each DEAL config, every seed) ---
    runs: dict = {}
    for cfg in [base_cfg] + deal_cfgs:
        for seed in seeds:
            ck = train_one(cfg, seed, data_yaml, root, epochs, imgsz, batch,
                           deal_loss=cfg != base_cfg)
            runs[(cfg, seed)] = {"ckpt": ck, "val": full_val(ck, data_yaml, imgsz)}
            LOGGER.info(f"experiment: {Path(cfg).stem} s{seed} -> {runs[(cfg, seed)]['val']}")

    # --- the testandcox protocol: paired bootstrap per (deal cfg, seed) ---
    idxs = bootstrap_indices(len(ds), n_bootstrap=30, fraction=0.5, seed=42)

    def boot_scores(ckpt):
        stats = per_image_stats(YOLO(str(ckpt)), ds, imgsz)
        return np.asarray([map50_of_subset(stats, i) for i in idxs])

    base_boot = {s: boot_scores(runs[(base_cfg, s)]["ckpt"]) for s in seeds}
    comparisons = []
    for cfg in deal_cfgs:
        for s in seeds:
            r = compare_scores(boot_scores(runs[(cfg, s)]["ckpt"]), base_boot[s])
            comparisons.append((cfg, s, r))
            LOGGER.info(f"experiment: {Path(cfg).stem} vs base (seed {s}): {r.summary()}")

    # --- EXPERIMENTS.md ---
    def val_row(cfg, s):
        v = runs[(cfg, s)]["val"]
        return (f"| {Path(cfg).stem} | {s} | {v['precision']:.4f} | {v['recall']:.4f} "
                f"| {v['mAP50']:.4f} | {v['mAP50-95']:.4f} |")

    def cmp_row(cfg, s, r):
        sig = "yes" if min(r.t_p, r.wilcoxon_p) < 0.05 else "no"
        return (f"| {Path(cfg).stem} | {s} | {r.scores_a.mean():.4f} | {r.scores_b.mean():.4f} "
                f"| {r.mean_diff:+.4f} | {r.t_p:.2e} | {r.wilcoxon_p:.2e} | {r.cohens_d:.2f} "
                f"| [{r.ci_bootstrap[0]:+.4f}, {r.ci_bootstrap[1]:+.4f}] | {sig} |")

    mean_by_cfg = {
        cfg: np.mean([runs[(cfg, s)]["val"]["mAP50"] for s in seeds])
        for cfg in [base_cfg] + deal_cfgs
    }
    report = f"""# DEAL-YOLO vs baseline — the fork's experiment, end-to-end on TPU

The experiment the reference fork exists to run (`testandcox.py`: DEAL
weights vs vanilla yolov8n, bootstrap mAP50 significance), executed fully in
this framework: every model **trained here** ({epochs} epochs, {imgsz}px,
batch {batch}, SGD) on the shared synthetic dataset ({n_train} train /
{n_val} val images, seed 11, log-uniform scales + 1:2..2:1 aspects), DEAL
configs with the paper's WIoU+NWD box loss ({DEAL_LOSS}), then the
reference's exact statistical protocol (testandcox.py:253-307 via
`utils/stats.py`): 30 bootstrap subsamples of 50% of val, per-subsample
mAP50 pairs, Shapiro + paired t + Wilcoxon + Cohen's d + bootstrap CI.

## Per-seed full-val metrics

| model | seed | P | R | mAP50 | mAP50-95 |
|---|---|---|---|---|---|
""" + "\n".join(val_row(cfg, s) for cfg in [base_cfg] + deal_cfgs for s in seeds) + f"""

Seed-mean mAP50: """ + ", ".join(
        f"{Path(c).stem} {m:.4f}" for c, m in mean_by_cfg.items()
    ) + """.

## Paired bootstrap significance (DEAL − baseline, same seed)

30 subsamples × 50% of val; each cell pairs the DEAL model's per-subsample
mAP50 against the baseline's on identical subsamples (reference protocol).

| deal model | seed | deal mAP50 | base mAP50 | mean diff | t p | wilcoxon p | Cohen's d | 95% boot CI | significant |
|---|---|---|---|---|---|---|---|---|---|
""" + "\n".join(cmp_row(cfg, s, r) for cfg, s, r in comparisons) + f"""

Reproduce: `python scripts/run_experiment.py seeds={",".join(map(str, seeds))} epochs={epochs} imgsz={imgsz}`.
Checkpoints under `{root.relative_to(REPO) if root.is_relative_to(REPO) else root}/train/`.
"""
    (REPO / "EXPERIMENTS.md").write_text(report)
    (root / "results.json").write_text(json.dumps(
        {f"{Path(cfg).stem}_s{s}": runs[(cfg, s)]["val"] for cfg in [base_cfg] + deal_cfgs for s in seeds},
        indent=1))
    LOGGER.info("experiment: wrote EXPERIMENTS.md")


if __name__ == "__main__":
    main(sys.argv[1:])
