"""Tuner evolution-loop tests (with a stub trainer for speed) + multi-scale."""

from pathlib import Path

import numpy as np
import pytest

from experiment_yolo_tpu.engine.tuner import SEARCH_SPACE, Tuner


class _StubModel:
    """Fitness peaks at lr0=0.01: the tuner must climb toward it."""

    def train(self, **kw):
        lr0 = kw["lr0"]
        fit = float(np.exp(-((np.log10(lr0) - np.log10(0.01)) ** 2)))
        return {"fitness": fit}


def test_tuner_improves_and_logs(tmp_path):
    tuner = Tuner(base_args={"lr0": 0.0001, "data": "x"}, save_dir=str(tmp_path / "tune"))
    best = tuner(lambda: _StubModel(), iterations=12, seed=0)
    assert set(best) == set(SEARCH_SPACE)
    rows = tuner._read_results()
    assert len(rows) == 12
    fits = [r[0] for r in rows]
    # evolution must beat the (bad) starting point
    assert max(fits) > fits[0]
    # all hyps clipped into bounds
    for _, hyp in rows:
        for k, (_, lo, hi) in SEARCH_SPACE.items():
            assert lo <= hyp[k] <= hi


def test_tuner_survives_failing_iteration(tmp_path):
    class Boom:
        def train(self, **kw):
            raise RuntimeError("diverged")

    tuner = Tuner(base_args={"lr0": 0.01}, save_dir=str(tmp_path / "tune2"))
    best = tuner(lambda: Boom(), iterations=2, seed=0)
    assert len(tuner._read_results()) == 2  # recorded as fitness 0, no crash


def test_multi_scale_rescale_batch():
    from experiment_yolo_tpu.engine.trainer import DetectionTrainer
    from experiment_yolo_tpu.nn.tasks import DetectionModel
    import jax

    model = DetectionModel(str(Path(__file__).parent / "assets" / "tiny.yaml"))
    v = model.init(jax.random.PRNGKey(0))
    tr = DetectionTrainer(model=model, variables=v, overrides={"imgsz": 128, "multi_scale": True})
    batch = {"img": np.zeros((2, 128, 128, 3), np.uint8), "mask": np.zeros((2, 4), bool)}
    sizes = set()
    rng = np.random.default_rng(0)
    for _ in range(20):
        out = tr._rescale_batch(batch, rng)
        sizes.add(out["img"].shape[1])
        assert out["img"].shape[1] % max(model.strides) == 0
    assert len(sizes) >= 3  # multiple buckets exercised
