"""Checkpoint save/load via orbax.

TPU counterpart of the reference's ``BaseTrainer.save_model``
(engine/trainer.py:898: ckpt dict with model, EMA, optimizer, train_args,
epoch, best_fitness) and ``attempt_load_one_weight``. A checkpoint is a
directory: orbax pytree state + a sidecar meta.yaml with the model yaml,
class names and train args so a checkpoint is self-describing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from experiment_yolo_tpu.utils import LOGGER, yaml_load, yaml_save


def save_checkpoint(
    path: str | Path,
    model,
    variables: Dict,
    *,
    ema_variables: Optional[Dict] = None,
    opt_state: Any = None,
    meta: Optional[Dict] = None,
) -> None:
    """Save variables (+optional EMA/optimizer state) and model metadata."""
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    state: Dict[str, Any] = {"variables": variables}
    if ema_variables is not None:
        state["ema_variables"] = ema_variables
    if opt_state is not None:
        state["opt_state"] = opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "state", jax.tree.map(jnp.asarray, state), force=True)
    ckptr.wait_until_finished()
    model_yaml = {k: v for k, v in model.yaml.items() if k != "yaml_file"}
    yaml_save(
        path / "meta.yaml",
        {"model_yaml": model_yaml, "nc": model.nc, "task": getattr(model, "task", "detect"), **(meta or {})},
    )


def _restore_as_numpy(state_path: Path):
    """Device-agnostic orbax restore: arrays come back as host numpy, so a
    checkpoint written on TPU loads on a CPU-only process (and vice versa)
    instead of failing on the recorded device shardings."""
    import numpy as np

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(state_path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree.map(lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(state_path, restore_args=restore_args)


def load_matching_variables(path: str | Path, variables: Dict, prefer_ema: bool = True) -> Tuple[Dict, int, int]:
    """Merge checkpoint leaves into ``variables`` where path AND shape match.

    The reference's ``Model.load`` transfers weights through
    ``intersect_dicts`` (name+shape intersection) so a checkpoint from a
    different-nc or partially-changed architecture still loads its
    compatible subset. Pytree analogue: flatten both trees by key path,
    take the checkpoint leaf wherever the path exists and the shape agrees.
    Returns (merged_variables, n_matched, n_total_leaves).
    """
    import numpy as np

    path = Path(path).resolve()
    state = _restore_as_numpy(path / "state")
    src = state.get("ema_variables") if prefer_ema and state.get("ema_variables") is not None else state["variables"]
    src_flat = {jax.tree_util.keystr(kp): v for kp, v in jax.tree_util.tree_flatten_with_path(src)[0]}
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    merged, matched = [], 0
    for kp, v in dst_flat:
        s = src_flat.get(jax.tree_util.keystr(kp))
        if s is not None and np.shape(s) == np.shape(v):
            merged.append(jnp.asarray(s, dtype=getattr(v, "dtype", None)))
            matched += 1
        else:
            merged.append(v)
    return jax.tree_util.tree_unflatten(treedef, merged), matched, len(dst_flat)


def load_checkpoint(path: str | Path, dtype=jnp.float32, prefer_ema: bool = True) -> Tuple[Any, Dict]:
    """Load (DetectionModel, variables) from a checkpoint dir.

    Prefers EMA weights for inference (the reference validates/exports the
    EMA model — trainer.py:909).
    """
    from experiment_yolo_tpu.nn.tasks import DetectionModel, TASK_MODELS

    path = Path(path).resolve()
    meta = yaml_load(path / "meta.yaml")
    cls = TASK_MODELS.get(meta.get("task", "detect"), DetectionModel)
    model = cls(meta["model_yaml"], dtype=dtype)
    state = _restore_as_numpy(path / "state")
    variables = state.get("ema_variables") if prefer_ema and state.get("ema_variables") is not None else state["variables"]
    if "names" in meta:
        model.names = {int(k): v for k, v in meta["names"].items()} if isinstance(meta["names"], dict) else dict(enumerate(meta["names"]))
    return model, variables
