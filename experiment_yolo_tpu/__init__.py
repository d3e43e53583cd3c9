"""experiment_yolo_tpu — a TPU-native (JAX/XLA/Pallas) detection framework.

A from-scratch rebuild of the capabilities of DEAL-YOLO (Experiment-YOLO,
an Ultralytics YOLOv8 fork specialised for small-object UAV detection),
designed TPU-first:

- models are pure functions over parameter pytrees (flax.linen), NHWC layout;
- the whole predict path (preprocess -> backbone -> DFL decode -> NMS) is one
  XLA program with static shapes and no host round-trips;
- data parallelism is a `jax.sharding.Mesh` axis, not DDP subprocesses;
- hot inner ops (LDConv bilinear gather, NMS suppression) have Pallas kernels
  with pure-jnp references.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from experiment_yolo_tpu.engine.model import YOLO  # noqa: E402

__all__ = ["YOLO", "__version__"]
