"""Config system: typed defaults + override merge.

Counterpart of the reference's ``ultralytics/cfg/__init__.py:192``
(``get_cfg`` with CFG_FLOAT/FRACTION/INT/BOOL check tables and fuzzy
mismatch suggestions).
"""

from __future__ import annotations

import difflib
from pathlib import Path
from typing import Any, Dict, Optional, Union

from experiment_yolo_tpu.utils import ROOT, IterableSimpleNamespace, yaml_load

DEFAULT_CFG_PATH = ROOT / "cfg" / "default.yaml"
DEFAULT_CFG_DICT: Dict[str, Any] = {k: v for k, v in yaml_load(DEFAULT_CFG_PATH).items() if k != "yaml_file"}
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)

# type-check tables (reference cfg/__init__.py:96-170)
CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "iou_ratio"}
CFG_FRACTION_KEYS = {
    "dropout", "lrf", "momentum", "weight_decay", "warmup_momentum", "warmup_bias_lr",
    "label_smoothing", "hsv_h", "hsv_s", "hsv_v", "translate", "scale", "perspective",
    "flipud", "fliplr", "mosaic", "mosaic9", "mixup", "copy_paste", "conf", "iou", "fraction", "ema_decay",
}
CFG_INT_KEYS = {
    "epochs", "patience", "batch", "workers", "seed", "close_mosaic", "max_det",
    "save_period", "max_labels", "ema_tau", "nbs", "spatial",
}
CFG_BOOL_KEYS = {
    "save", "exist_ok", "pretrained", "verbose", "deterministic", "single_cls",
    "rect", "cos_lr", "amp", "multi_scale", "val", "save_json", "half",
    # NB: resume may be bool OR a ckpt path; cache may be bool OR 'ram'/'disk'
    "agnostic_nms", "augment", "save_txt", "save_conf", "save_crop", "show_labels",
    "show_conf", "show_boxes", "plots", "use_wiseiou", "nwd", "ema", "soft_nms_quirk",
}


def cfg2dict(cfg: Union[str, Path, dict, IterableSimpleNamespace]) -> dict:
    if isinstance(cfg, (str, Path)):
        cfg = yaml_load(cfg)
        cfg.pop("yaml_file", None)
    elif isinstance(cfg, IterableSimpleNamespace):
        cfg = vars(cfg).copy()
    return dict(cfg)


def check_dict_alignment(base: dict, custom: dict) -> None:
    """Raise with fuzzy suggestions on unknown keys (reference cfg:286)."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        msgs = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, base.keys(), n=3, cutoff=0.5)
            hint = f" — did you mean {matches}?" if matches else ""
            msgs.append(f"'{k}' is not a valid config key{hint}")
        raise SyntaxError("\n".join(msgs))


def _coerce(k: str, v: Any) -> Any:
    if v is None or v == "None":
        return None
    if k == "remat":
        # bool (remat all layers) OR int (remat only layers whose input
        # spatial area H*W >= the value) — like resume, a dual-typed key
        if isinstance(v, (bool, int)):
            return v
        if isinstance(v, str):
            if v.lower() in ("true", "false"):
                return v.lower() == "true"
            try:
                return int(v)
            except ValueError:
                pass
        raise TypeError(f"'remat={v}' must be a bool or int (min input H*W)")
    if k in CFG_BOOL_KEYS and not isinstance(v, bool):
        if isinstance(v, str) and v.lower() in ("true", "false"):
            return v.lower() == "true"
        raise TypeError(f"'{k}={v}' must be a bool")
    if k in CFG_INT_KEYS and not isinstance(v, int):
        try:
            return int(v)
        except (TypeError, ValueError) as e:
            raise TypeError(f"'{k}={v}' must be an int") from e
    if k in (CFG_FLOAT_KEYS | CFG_FRACTION_KEYS) and not isinstance(v, (int, float)):
        try:
            v = float(v)
        except (TypeError, ValueError) as e:
            raise TypeError(f"'{k}={v}' must be a number") from e
    if k in CFG_FRACTION_KEYS and v is not None and not (0.0 <= float(v) <= 1.0):
        raise ValueError(f"'{k}={v}' must be in [0, 1]")
    return v


def check_imgsz(imgsz: int, stride: int = 32, min_dim: int = 0) -> int:
    """Round imgsz up to a multiple of the max stride (reference
    utils/checks.py:check_imgsz) — closes the raw-XLA-error failure mode for
    non-divisible sizes."""
    import math

    new = max(int(math.ceil(imgsz / stride) * stride), min_dim)
    if new != imgsz:
        from experiment_yolo_tpu.utils import LOGGER

        LOGGER.info(f"imgsz={imgsz} is not a multiple of max stride {stride}; using imgsz={new}")
    return new


def get_cfg(
    cfg: Union[str, Path, dict, IterableSimpleNamespace] = DEFAULT_CFG_DICT,
    overrides: Optional[dict] = None,
) -> IterableSimpleNamespace:
    """Merge defaults < cfg < overrides into a validated namespace."""
    cfg = cfg2dict(cfg)
    merged = {**DEFAULT_CFG_DICT, **cfg}
    if overrides:
        overrides = cfg2dict(overrides)
        check_dict_alignment(merged, overrides)
        merged = {**merged, **overrides}
    merged = {k: _coerce(k, v) for k, v in merged.items()}
    return IterableSimpleNamespace(**merged)
