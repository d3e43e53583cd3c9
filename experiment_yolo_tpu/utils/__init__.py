"""Shared utilities: logging, YAML IO, simple namespaces.

Counterpart of the reference's ``ultralytics/utils/__init__.py`` (LOGGER,
SimpleClass, yaml_load/save) — rebuilt minimal; no torch anywhere.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from types import SimpleNamespace

import yaml

ROOT = Path(__file__).resolve().parents[1]
RANK = int(os.getenv("RANK", -1))  # kept for API familiarity; JAX uses process_index


def _make_logger(name: str = "yolo_tpu", verbose: bool = True) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(h)
    logger.setLevel(logging.INFO if verbose else logging.ERROR)
    logger.propagate = False
    return logger


LOGGER = _make_logger()


def yaml_load(file: str | Path) -> dict:
    """Load a YAML file into a dict (utf-8, ignores non-serializable chars)."""
    with open(file, errors="ignore", encoding="utf-8") as f:
        data = yaml.safe_load(f.read()) or {}
    data["yaml_file"] = str(file)
    return data


def yaml_save(file: str | Path, data: dict) -> None:
    Path(file).parent.mkdir(parents=True, exist_ok=True)
    clean = {k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}
    with open(file, "w", encoding="utf-8") as f:
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


class IterableSimpleNamespace(SimpleNamespace):
    """Namespace that supports iteration and dict-style access.

    Mirrors the config object contract of the reference
    (``ultralytics/utils/__init__.py:IterableSimpleNamespace``).
    """

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def colorstr(*args):
    """ANSI-colored string, e.g. colorstr('blue', 'bold', 'hello')."""
    *prefix, string = args if len(args) > 1 else ("blue", "bold", args[0])
    codes = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bold": "\033[1m", "end": "\033[0m",
    }
    return "".join(codes.get(x, "") for x in prefix) + str(string) + codes["end"]


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """Increment a path, i.e. runs/exp -> runs/exp2, runs/exp3, ...

    Same contract as the reference's ``utils/files.py:increment_path``.
    """
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


class Profile:
    """Context/decorator timer (reference utils/ops.py:18 Profile): on-device
    work is flushed with block_until_ready analogous to cuda.synchronize."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        import time

        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import time

        self.dt = time.perf_counter() - self._start
        self.t += self.dt

    def __str__(self):
        return f"Elapsed time is {self.t} s"

    @staticmethod
    def sync(x):
        """Block until device values are ready (the cuda.synchronize slot)."""
        import jax

        jax.block_until_ready(x)
        return x


class TryExcept:
    """Context/decorator that logs-and-continues (utils/__init__.py:723)."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __call__(self, fn):
        import functools

        @functools.wraps(fn)
        def wrapped(*a, **k):
            with self:
                return fn(*a, **k)

        return wrapped

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if self.verbose and value is not None:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


def retry(times: int = 3, delay: float = 1.0):
    """Retry decorator with linear backoff (reference utils Retry)."""
    import functools
    import time as _time

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **k):
            for attempt in range(times):
                try:
                    return fn(*a, **k)
                except Exception:
                    if attempt == times - 1:
                        raise
                    _time.sleep(delay * (attempt + 1))

        return wrapped

    return deco


class SettingsManager(dict):
    """Persistent JSON settings (reference utils/__init__.py:905): defaults +
    user overrides at a fixed path, with integration on/off switches."""

    DEFAULTS = {
        "settings_version": "0.1.0",
        "datasets_dir": "datasets",
        "weights_dir": "weights",
        "runs_dir": "runs",
        "sync": True,
        "tensorboard": True,
        "wandb": True,
        "mlflow": True,
        "comet": True,
        "clearml": True,
        "neptune": True,
        "dvc": True,
        "raytune": True,
        "hub": True,
    }

    def __init__(self, file: str | Path | None = None):
        import json

        self.file = Path(file or Path.home() / ".config" / "experiment_yolo_tpu" / "settings.json")
        super().__init__(self.DEFAULTS)
        if self.file.exists():
            try:
                self.update(json.loads(self.file.read_text()))
            except Exception:
                pass
        else:
            self.save()

    def save(self):
        import json

        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        self.save()

    def reset(self):
        self.clear()
        super().update(self.DEFAULTS)
        self.save()


def get_latest_run(search_dir: str | Path = "runs") -> str:
    """Most recent checkpoint dir under runs/ (reference utils/files.py)."""
    import glob

    cands = glob.glob(str(Path(search_dir) / "**" / "weights" / "last*"), recursive=True)
    return max(cands, key=os.path.getmtime) if cands else ""


def strip_optimizer(ckpt_dir: str | Path, out_dir: str | Path | None = None) -> Path:
    """Deployment-strip a checkpoint (reference torch_utils.py:466): keep
    only the (EMA-preferred) variables cast to fp16, drop optimizer state
    and the non-EMA copy; meta.yaml carries over with stripped=True."""
    import shutil

    import numpy as np
    import orbax.checkpoint as ocp

    from experiment_yolo_tpu.engine.checkpoint import _restore_as_numpy

    ckpt_dir = Path(ckpt_dir).resolve()
    out_dir = Path(out_dir).resolve() if out_dir else ckpt_dir.with_name(ckpt_dir.name + "_stripped")
    state = _restore_as_numpy(ckpt_dir / "state")
    variables = state.get("ema_variables") or state["variables"]

    def half(a):
        a = np.asarray(a)
        return a.astype(np.float16) if np.issubdtype(a.dtype, np.floating) else a

    variables = jax.tree.map(half, variables)
    if out_dir.exists():
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir / "state", {"variables": variables}, force=True)
    ckptr.wait_until_finished()
    if (ckpt_dir / "meta.yaml").exists():
        meta = yaml_load(ckpt_dir / "meta.yaml")
        meta["stripped"] = True
        yaml_save(out_dir / "meta.yaml", meta)
    return out_dir


import jax  # noqa: E402  (used by Profile.sync / strip_optimizer)
