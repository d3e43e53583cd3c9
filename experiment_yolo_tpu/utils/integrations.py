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


def add_wandb_callbacks(callbacks, project: Optional[str] = None) -> bool:
    """Weights & Biases logging (reference utils/callbacks/wb.py): run init
    on train start, per-epoch metric logging, summary + finish at end.
    Import-gated — wandb is not bundled in this environment."""
    try:
        import wandb  # pragma: no cover - optional dep
    except ImportError:
        LOGGER.info("W&B logging unavailable (wandb not installed)")
        return False
    state = {"run": None, "epoch": 0}  # pragma: no cover

    def on_pretrain_routine_start(trainer):  # pragma: no cover
        state["run"] = wandb.init(project=project or "experiment-yolo-tpu",
                                  name=trainer.save_dir.name, config=vars(trainer.args))

    def on_fit_epoch_end(trainer):  # pragma: no cover
        wandb.log({**{f"train/{k}": float(v) for k, v in getattr(trainer, "loss_items", {}).items()},
                   **{f"metrics/{k}": v for k, v in trainer.metrics.items() if isinstance(v, float)}},
                  step=state["epoch"])
        state["epoch"] += 1

    def on_train_end(trainer):  # pragma: no cover
        if state["run"] is not None:
            state["run"].finish()

    callbacks.add("on_pretrain_routine_start", on_pretrain_routine_start)  # pragma: no cover
    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)  # pragma: no cover
    callbacks.add("on_train_end", on_train_end)  # pragma: no cover
    return True  # pragma: no cover


def add_mlflow_callbacks(callbacks, experiment: Optional[str] = None) -> bool:
    """MLflow logging (reference utils/callbacks/mlflow.py). Import-gated."""
    try:
        import mlflow  # pragma: no cover - optional dep
    except ImportError:
        LOGGER.info("MLflow logging unavailable (mlflow not installed)")
        return False
    state = {"epoch": 0}  # pragma: no cover

    def on_pretrain_routine_start(trainer):  # pragma: no cover
        mlflow.set_experiment(experiment or "experiment-yolo-tpu")
        mlflow.start_run(run_name=trainer.save_dir.name)
        mlflow.log_params({k: v for k, v in vars(trainer.args).items() if isinstance(v, (int, float, str, bool))})

    def on_fit_epoch_end(trainer):  # pragma: no cover
        mlflow.log_metrics({f"train_{k}": float(v) for k, v in getattr(trainer, "loss_items", {}).items()},
                           step=state["epoch"])
        mlflow.log_metrics({k.replace("(", "").replace(")", ""): v for k, v in trainer.metrics.items()
                            if isinstance(v, float)}, step=state["epoch"])
        state["epoch"] += 1

    def on_train_end(trainer):  # pragma: no cover
        mlflow.end_run()

    callbacks.add("on_pretrain_routine_start", on_pretrain_routine_start)  # pragma: no cover
    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)  # pragma: no cover
    callbacks.add("on_train_end", on_train_end)  # pragma: no cover
    return True  # pragma: no cover


def add_comet_callbacks(callbacks, project: Optional[str] = None) -> bool:
    """Comet logging (reference utils/callbacks/comet.py). Import-gated."""
    try:
        import comet_ml  # pragma: no cover - optional dep
    except ImportError:
        LOGGER.info("Comet logging unavailable (comet_ml not installed)")
        return False
    state = {"exp": None, "epoch": 0}  # pragma: no cover

    def on_pretrain_routine_start(trainer):  # pragma: no cover
        state["exp"] = comet_ml.Experiment(project_name=project or "experiment-yolo-tpu")

    def on_fit_epoch_end(trainer):  # pragma: no cover
        if state["exp"] is not None:
            state["exp"].log_metrics({**getattr(trainer, "loss_items", {}),
                                      **{k: v for k, v in trainer.metrics.items() if isinstance(v, float)}},
                                     epoch=state["epoch"])
        state["epoch"] += 1

    def on_train_end(trainer):  # pragma: no cover
        if state["exp"] is not None:
            state["exp"].end()

    callbacks.add("on_pretrain_routine_start", on_pretrain_routine_start)  # pragma: no cover
    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)  # pragma: no cover
    callbacks.add("on_train_end", on_train_end)  # pragma: no cover
    return True  # pragma: no cover


def add_clearml_callbacks(callbacks, project: Optional[str] = None) -> bool:
    """ClearML hooks (reference utils/callbacks/clearml.py); gated import."""
    try:  # pragma: no cover - optional dependency
        from clearml import Task
    except Exception:
        return False

    task = Task.init(project_name=project or "experiment-yolo-tpu", task_name="train")

    def on_fit_epoch_end(trainer):  # pragma: no cover
        for k, v in {**getattr(trainer, "loss_items", {}), **getattr(trainer, "metrics", {})}.items():
            if isinstance(v, (int, float)):
                task.get_logger().report_scalar("train", k, float(v), getattr(trainer, "epoch", 0))

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    return True


def add_neptune_callbacks(callbacks, project: Optional[str] = None) -> bool:
    """Neptune hooks (reference utils/callbacks/neptune.py); gated import."""
    try:  # pragma: no cover - optional dependency
        import neptune
    except Exception:
        return False

    run = neptune.init_run(project=project)

    def on_fit_epoch_end(trainer):  # pragma: no cover
        for k, v in {**getattr(trainer, "loss_items", {}), **getattr(trainer, "metrics", {})}.items():
            if isinstance(v, (int, float)):
                run[f"train/{k}"].append(float(v))

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    return True


def add_dvc_callbacks(callbacks) -> bool:
    """DVCLive hooks (reference utils/callbacks/dvc.py); gated import."""
    try:  # pragma: no cover - optional dependency
        from dvclive import Live
    except Exception:
        return False

    live = Live(save_dvc_exp=True)

    def on_fit_epoch_end(trainer):  # pragma: no cover
        for k, v in {**getattr(trainer, "loss_items", {}), **getattr(trainer, "metrics", {})}.items():
            if isinstance(v, (int, float)):
                live.log_metric(k, float(v))
        live.next_step()

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    return True


def add_raytune_callbacks(callbacks) -> bool:
    """Ray Tune session reporting (reference utils/callbacks/raytune.py)."""
    try:  # pragma: no cover - optional dependency
        from ray import train as ray_train
        from ray.tune import is_session_enabled
        if not is_session_enabled():
            return False
    except Exception:
        return False

    def on_fit_epoch_end(trainer):  # pragma: no cover
        ray_train.report({**getattr(trainer, "metrics", {}),
                          "epoch": getattr(trainer, "epoch", 0)})

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    return True


def add_integration_callbacks(trainer) -> list:
    """Attach every available integration (reference
    utils/callbacks/base.py:add_integration_callbacks): tries TB, W&B,
    MLflow, Comet; silently skips whatever is not installed."""
    attached = []
    if add_tensorboard_callbacks(trainer.callbacks):
        attached.append("tensorboard")
    if add_wandb_callbacks(trainer.callbacks):
        attached.append("wandb")
    if add_mlflow_callbacks(trainer.callbacks):
        attached.append("mlflow")
    if add_comet_callbacks(trainer.callbacks):
        attached.append("comet")
    if add_clearml_callbacks(trainer.callbacks):
        attached.append("clearml")
    if add_neptune_callbacks(trainer.callbacks):
        attached.append("neptune")
    if add_dvc_callbacks(trainer.callbacks):
        attached.append("dvc")
    if add_raytune_callbacks(trainer.callbacks):
        attached.append("raytune")
    return attached


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
