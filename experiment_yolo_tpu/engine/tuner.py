"""Hyperparameter evolution tuner.

Rebuild of the reference's ``engine/tuner.py:32`` (Tuner): per iteration,
mutate hyperparameters from the best parents (gaussian perturbation with
per-key gain and bounds), run a short training, record fitness in a CSV,
keep the best.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from experiment_yolo_tpu.utils import LOGGER, increment_path

# key: (mutation gain, min, max) — reference tuner.py space
SEARCH_SPACE: Dict[str, Tuple[float, float, float]] = {
    "lr0": (1.0, 1e-5, 1e-1),
    "lrf": (1.0, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1.0, 0.0, 0.001),
    "warmup_epochs": (1.0, 0.0, 5.0),
    "warmup_momentum": (1.0, 0.0, 0.95),
    "box": (1.0, 0.02, 0.2 * 100),
    "cls": (1.0, 0.2, 4.0),
    "dfl": (1.0, 0.4, 6.0),
    "hsv_h": (1.0, 0.0, 0.1),
    "hsv_s": (1.0, 0.0, 0.9),
    "hsv_v": (1.0, 0.0, 0.9),
    "degrees": (1.0, 0.0, 45.0),
    "translate": (1.0, 0.0, 0.9),
    "scale": (1.0, 0.0, 0.9),
    "shear": (1.0, 0.0, 10.0),
    "flipud": (1.0, 0.0, 1.0),
    "fliplr": (1.0, 0.0, 1.0),
    "mosaic": (1.0, 0.0, 1.0),
    "mixup": (1.0, 0.0, 1.0),
}


class Tuner:
    def __init__(self, base_args: Dict, space: Optional[Dict] = None, save_dir: Optional[str] = None):
        self.base_args = dict(base_args)
        self.space = space or SEARCH_SPACE
        self.save_dir = increment_path(Path(save_dir or "runs/tune"), mkdir=True)
        self.csv = self.save_dir / "tune_results.csv"

    def _mutate(self, rng: np.random.Generator, mutation: float = 0.8, sigma: float = 0.2) -> Dict:
        """Mutate from the best parents (reference tuner.py:_mutate)."""
        rows = self._read_results()
        hyp = {k: float(self.base_args.get(k, (lo + hi) / 2)) for k, (_, lo, hi) in self.space.items()}
        if rows:
            # fitness-weighted parent selection among top 5
            rows.sort(key=lambda r: -r[0])
            parents = rows[:5]
            weights = np.asarray([max(r[0], 1e-6) for r in parents])
            parent = parents[rng.choice(len(parents), p=weights / weights.sum())][1]
            hyp.update(parent)
            # gaussian mutation
            gains = np.asarray([self.space[k][0] for k in self.space])
            factors = np.ones(len(self.space))
            while (factors == 1.0).all():
                mask = rng.random(len(self.space)) < mutation
                factors = np.where(mask, 1.0 + rng.normal(0, sigma, len(self.space)) * gains, 1.0)
            for k, f in zip(self.space, factors):
                hyp[k] = float(hyp[k] * f)
        for k, (_, lo, hi) in self.space.items():
            hyp[k] = float(np.clip(hyp[k], lo, hi))
        return hyp

    def _read_results(self):
        if not self.csv.exists():
            return []
        rows = []
        with open(self.csv) as f:
            reader = csv.DictReader(f)
            for row in reader:
                fit = float(row.pop("fitness"))
                rows.append((fit, {k: float(v) for k, v in row.items()}))
        return rows

    def _append_result(self, fitness: float, hyp: Dict) -> None:
        exists = self.csv.exists()
        with open(self.csv, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["fitness"] + list(self.space))
            if not exists:
                writer.writeheader()
            writer.writerow({"fitness": fitness, **{k: hyp[k] for k in self.space}})

    def __call__(self, model_factory, iterations: int = 10, seed: int = 0) -> Dict:
        """Run evolution. model_factory() -> fresh YOLO; returns best hyp.

        Each iteration trains with mutated hyperparameters and records the
        fitness (0.1*mAP50 + 0.9*mAP50-95) from validation.
        """
        rng = np.random.default_rng(seed)
        best_fit, best_hyp = -1.0, {}
        for i in range(iterations):
            hyp = self._mutate(rng)
            model = model_factory()
            args = {**self.base_args, **hyp, "project": str(self.save_dir), "name": f"iter{i}", "exist_ok": True}
            try:
                metrics = model.train(**args)
                fit = float(metrics.get("fitness", 0.0))
            except Exception as e:  # a bad hyp combo must not kill the search
                LOGGER.info(f"tune iter {i}: failed ({type(e).__name__}: {e})")
                fit = 0.0
            self._append_result(fit, hyp)
            if fit > best_fit:
                best_fit, best_hyp = fit, hyp
            LOGGER.info(f"tune iter {i + 1}/{iterations}: fitness {fit:.4f} (best {best_fit:.4f})")
        LOGGER.info(f"tune: best fitness {best_fit:.4f} with {best_hyp}")
        return best_hyp
