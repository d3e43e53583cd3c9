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
