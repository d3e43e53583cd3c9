"""Optional logging integrations on the callback bus.

Counterpart of the reference's ``utils/callbacks/{tensorboard,wb,...}.py``:
each integration registers handlers on the Callbacks event table. Only
TensorBoard ships for now (tensorflow is in the base image); others follow
the same three-function shape.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from experiment_yolo_tpu.utils import LOGGER


def add_tensorboard_callbacks(callbacks, log_dir: Optional[str] = None) -> bool:
    """Attach TensorBoard scalar logging to a trainer's callback bus."""
    try:
        import tensorflow as tf
    except ImportError:
        LOGGER.info("TensorBoard logging unavailable (tensorflow not installed)")
        return False

    state = {"writer": None, "epoch": 0}

    def on_train_epoch_start(trainer):
        if state["writer"] is None:
            state["writer"] = tf.summary.create_file_writer(str(log_dir or trainer.save_dir / "tb"))

    def on_fit_epoch_end(trainer):
        w = state["writer"]
        if w is None:
            return
        step = state["epoch"]
        with w.as_default():
            for k, v in getattr(trainer, "loss_items", {}).items():
                tf.summary.scalar(f"train/{k}", float(v), step=step)
            for k, v in trainer.metrics.items():
                if isinstance(v, float):
                    tf.summary.scalar(f"metrics/{k}", float(v), step=step)
        w.flush()
        state["epoch"] += 1

    callbacks.add("on_train_epoch_start", on_train_epoch_start)
    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    return True


def plot_results(csv_path: str | Path, out_path: Optional[str | Path] = None):
    """Training-curve plot from results.csv (reference plotting.py:plot_results)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    csv_path = Path(csv_path)
    df = pd.read_csv(csv_path)
    cols = [c for c in df.columns if c != "epoch"]
    n = len(cols)
    ncols = min(4, n)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for ax, c in zip(axes.ravel(), cols):
        ax.plot(df["epoch"], df[c], marker=".")
        ax.set_title(c, fontsize=9)
        ax.set_xlabel("epoch")
    for ax in axes.ravel()[n:]:
        ax.axis("off")
    fig.tight_layout()
    out = Path(out_path) if out_path else csv_path.with_name("results.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
