"""Unit coverage for scripts/run_experiment.py (VERDICT r4 item: the
experiment driver's seed/resume handling would otherwise only surface bugs
after hours of training)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

import run_experiment  # noqa: E402

from experiment_yolo_tpu.utils.stats import bootstrap_indices  # noqa: E402


class _RecorderYOLO:
    """Stands in for YOLO: records ctor/train kwargs, never trains."""

    calls: list = []

    def __init__(self, cfg, **kw):
        self.cfg = cfg
        self.ctor_kw = kw

    def train(self, **kw):
        _RecorderYOLO.calls.append((self.cfg, self.ctor_kw, kw))


def test_train_one_reuses_finished_run(tmp_path, monkeypatch):
    root = tmp_path / "exp"
    ckpt = root / "train" / "yolov8n_s3" / "weights" / "best"
    ckpt.mkdir(parents=True)
    (ckpt / "meta.yaml").write_text("nc: 3\n")

    def _explode(*a, **k):
        raise AssertionError("finished run must not retrain")

    monkeypatch.setattr(run_experiment, "YOLO", _explode)
    out = run_experiment.train_one(
        "yolov8n.yaml", 3, tmp_path / "data.yaml", root, 40, 320, 16, False
    )
    assert out == ckpt


def test_train_one_passes_seed_and_deal_loss(tmp_path, monkeypatch):
    monkeypatch.setattr(run_experiment, "YOLO", _RecorderYOLO)
    _RecorderYOLO.calls = []
    root = tmp_path / "exp"

    run_experiment.train_one(
        "yolov8-LD-P2.yaml", 7, tmp_path / "d.yaml", root, 40, 320, 16, True
    )
    run_experiment.train_one(
        "yolov8n.yaml", 7, tmp_path / "d.yaml", root, 40, 320, 16, False
    )

    (cfg_a, ctor_a, train_a), (cfg_b, ctor_b, train_b) = _RecorderYOLO.calls
    # seed reaches BOTH the model init (param draw) and the train loop
    # (shuffling/augmentation) for every leg of the grid
    assert ctor_a["seed"] == 7 and train_a["seed"] == 7
    assert ctor_b["seed"] == 7 and train_b["seed"] == 7
    # DEAL legs get the paper's WIoU+NWD recipe; the baseline must not
    assert train_a["use_wiseiou"] and train_a["nwd"]
    assert "use_wiseiou" not in train_b and "nwd" not in train_b
    # runs are keyed by cfg+seed so reuse can find them
    assert train_a["name"] == "yolov8-LD-P2_s7"
    assert train_b["name"] == "yolov8n_s7"


def test_bootstrap_protocol_is_reproducible_and_paired():
    # the significance pairing relies on DEAL and baseline being scored on
    # IDENTICAL subsamples: indices come from one seeded draw
    a = bootstrap_indices(256, n_bootstrap=30, fraction=0.5, seed=42)
    b = bootstrap_indices(256, n_bootstrap=30, fraction=0.5, seed=42)
    assert len(a) == 30
    for i, j in zip(a, b):
        assert np.array_equal(i, j)
        assert len(i) == 128
        assert i.min() >= 0 and i.max() < 256
    c = bootstrap_indices(256, n_bootstrap=30, fraction=0.5, seed=43)
    assert not all(np.array_equal(i, j) for i, j in zip(a, c))
