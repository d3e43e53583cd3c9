"""Model facade — the `YOLO` user API.

Counterpart of the reference's ``engine/model.py:15`` (``Model``): one
object that routes ``.train()/.val()/.predict()/.benchmark()`` to the task
engines. Task map is detection-only for now (the reference's task_map at
``models/yolo/model.py:8-45``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from experiment_yolo_tpu.nn.tasks import DetectionModel
from experiment_yolo_tpu.utils import LOGGER


class YOLO:
    """Unified detection model API.

    Example:
        model = YOLO('yolov8n.yaml')
        model.train(data='coco128.yaml', epochs=3, imgsz=640)
        results = model.predict('image.jpg')
    """

    def __init__(self, model: str | Path = "yolov8n.yaml", nc: Optional[int] = None, dtype=jnp.float32, seed: int = 0, task: Optional[str] = None):
        model = str(model)
        self.ckpt_path: Optional[str] = None
        if model.endswith((".yaml", ".yml")):
            from experiment_yolo_tpu.nn.tasks import TASK_MODELS, guess_model_task

            task = task or guess_model_task(model)
            if task == "classify":
                from experiment_yolo_tpu.models.classify import ClassificationModel

                cls = ClassificationModel
            else:
                cls = TASK_MODELS.get(task, DetectionModel)
            self.model = cls(model, nc=nc, dtype=dtype) if nc else cls(model, dtype=dtype)
            self.variables = self.model.init(jax.random.PRNGKey(seed))
        elif (model.endswith((".stablehlo", ".tflite", ".onnx"))
              or (Path(model) / "saved_model.pb").exists()):
            # exported artifact: predict/val through AutoBackend (reference
            # YOLO('model.onnx') flow); train/export are unavailable
            from experiment_yolo_tpu.nn.autobackend import BackendModel

            self.model = BackendModel(model, nc=nc)
            self.variables = {}
        elif model.endswith(".ckpt") or Path(model).is_dir():
            from experiment_yolo_tpu.engine.checkpoint import load_checkpoint

            self.model, self.variables = load_checkpoint(model, dtype=dtype)
            self.ckpt_path = model
        else:
            raise ValueError(f"unsupported model source {model!r} (expected .yaml or checkpoint dir)")
        self.overrides: Dict[str, Any] = {}
        self.trainer = None
        self.predictor = None
        self._callbacks: Dict[str, list] = {}

    # -- info ---------------------------------------------------------------
    @property
    def nc(self) -> int:
        return self.model.nc

    def info(self) -> str:
        s = self.model.info(self.variables)
        LOGGER.info(s)
        return s

    def num_params(self) -> int:
        return self.model.num_params(self.variables)

    # -- task routing ---------------------------------------------------------
    def __call__(self, source, stream: bool = False, **kwargs):
        """``model(img)`` is predict — reference Model.__call__ (engine/model.py:145)."""
        return self.predict(source, stream=stream, **kwargs)

    @property
    def names(self):
        """Class-index -> name mapping of the underlying model."""
        return getattr(self.model, "names", None)

    def add_callback(self, event: str, fn) -> None:
        """Register a training-event hook (reference Model.add_callback,
        engine/model.py:787; 25-event table in utils/callbacks.py). Hooks
        are installed on every trainer this facade creates."""
        self._callbacks.setdefault(event, []).append(fn)

    def clear_callback(self, event: str) -> None:
        self._callbacks.pop(event, None)

    def reset_callbacks(self) -> None:
        self._callbacks = {}

    def train(self, **kwargs):
        from experiment_yolo_tpu.engine.trainer import DetectionTrainer

        self.trainer = DetectionTrainer(model=self.model, variables=self.variables, overrides={**self.overrides, **kwargs})
        for event, fns in self._callbacks.items():
            for fn in fns:
                self.trainer.callbacks.add(event, fn)
        results = self.trainer.train()
        self.variables = self.trainer.best_variables or self.trainer.variables
        if getattr(self.trainer, "_rebuilt_model", False):  # e.g. dataset kpt_shape
            self.model = self.trainer.model
        return results

    def val(self, **kwargs):
        from experiment_yolo_tpu.engine.validator import DetectionValidator

        task = getattr(self.model, "task", "detect")
        if task in ("segment", "pose", "obb"):
            from experiment_yolo_tpu.engine.validators_extra import TASK_VALIDATORS

            val_cls = TASK_VALIDATORS[task]
        else:
            val_cls = DetectionValidator
        validator = val_cls(args={**self.overrides, **kwargs})
        return validator(model=self.model, variables=self.variables)

    def predict(self, source, stream: bool = False, **kwargs):
        from experiment_yolo_tpu.engine.predictor import DetectionPredictor

        if self.predictor is None:
            self.predictor = DetectionPredictor(self.model, self.variables, overrides={**self.overrides, **kwargs})
        return self.predictor(source, stream=stream)

    def sliced_predict(self, source, stream: bool = False, slice: int = 512,
                       overlap: float = 0.2, include_full: bool = True, **kwargs):
        """SAHI-style sliced inference for small objects (reference
        examples/YOLOv8-SAHI-Inference-Video): overlapping slice grid,
        one batched forward per frame, global merged NMS."""
        from experiment_yolo_tpu.engine.sliced import SlicedPredictor

        pred = SlicedPredictor(self.model, self.variables,
                               overrides={**self.overrides, **kwargs},
                               slice=slice, overlap=overlap, include_full=include_full)
        return pred(source, stream=stream)

    def track(self, source, tracker: str = "bytetrack", persist: bool = False, stream: bool = False, **kwargs):
        """Predict + multi-object tracking over an ordered frame sequence.

        Counterpart of the reference's Model.track (engine/model.py:411 +
        trackers/track.py). Accepts video files and live streams (frames
        arrive in order through the streaming predictor). Returns Results
        with a (N, 7) boxes array [x1, y1, x2, y2, track_id, conf, cls]
        per frame; ``stream=True`` returns a lazy generator instead.
        """
        if not persist or getattr(self, "_tracker", None) is None:
            from experiment_yolo_tpu.trackers import TRACKER_MAP

            self._tracker = TRACKER_MAP[tracker]()
        gen = self._track_stream(source, tracker, **kwargs)
        return gen if stream else list(gen)

    def _track_stream(self, source, tracker: str, **kwargs):
        import numpy as np

        from experiment_yolo_tpu.engine.results import Results

        for r in self.predict(source, stream=True, **kwargs):
            xywh = r.boxes.xywh
            out = (
                self._tracker.update(xywh, r.boxes.conf, r.boxes.cls, frame=r.orig_img)
                if tracker == "botsort"
                else self._tracker.update(xywh, r.boxes.conf, r.boxes.cls)
            )
            # repack [x1,y1,x2,y2,id,score,cls] -> Results boxes (xyxy, conf, cls)
            boxes6 = out[:, [0, 1, 2, 3, 5, 6]] if len(out) else np.zeros((0, 6), np.float32)
            res = Results(r.orig_img, r.path, r.names, boxes6, speed=r.speed)
            res.track_ids = out[:, 4].astype(int) if len(out) else np.zeros((0,), int)
            res.boxes.id = res.track_ids  # reference Boxes.id parity
            yield res

    def benchmark(self, formats: bool = False, **kwargs):
        """Latency harness; ``formats=True`` produces the reference-style
        all-format table (export each format, run via AutoBackend —
        reference utils/benchmarks.py:benchmark)."""
        if formats:
            from experiment_yolo_tpu.utils.benchmarks import benchmark_formats

            return benchmark_formats(self.model, self.variables, **kwargs)
        from experiment_yolo_tpu.utils.benchmarks import benchmark_model

        return benchmark_model(self.model, self.variables, **kwargs)

    def tune(self, iterations: int = 10, **train_kwargs):
        """Hyperparameter evolution (reference Model.tune, engine/tuner.py)."""
        import jax as _jax

        from experiment_yolo_tpu.engine.tuner import Tuner
        from experiment_yolo_tpu.nn.tasks import DetectionModel

        yaml_cfg = dict(self.model.yaml)

        def factory():
            m = YOLO.__new__(YOLO)
            m.model = DetectionModel({k: v for k, v in yaml_cfg.items() if k != "yaml_file"})
            m.variables = m.model.init(_jax.random.PRNGKey(0))
            m.overrides, m.trainer, m.predictor, m.ckpt_path = {}, None, None, None
            m._callbacks = {}
            return m

        save_dir = str(Path(train_kwargs["project"]) / "tune") if "project" in train_kwargs else None
        tuner = Tuner(base_args=train_kwargs, save_dir=save_dir)
        return tuner(factory, iterations=iterations)

    def export(self, format: str = "stablehlo", path: str | Path = "model_export", imgsz: int = 640, batch: int = 1,
               int8: bool = False, half: bool = False, data=None):
        """Export the fused predict path (reference Model.export, model.py:513).

        ``int8``/``half`` apply post-training quantization on the tflite
        format (reference exporter int8/half args); ``data`` supplies int8
        calibration batches (uint8 NHWC arrays).
        """
        from experiment_yolo_tpu.engine.exporter import Exporter

        return Exporter(self.model, self.variables, imgsz=imgsz, batch=batch)(
            format, path, int8=int8, half=half, data=data)

    def double_predict(self, source, **kwargs):
        """Two-stage crop-and-refine inference (reference double_inference.py)."""
        from experiment_yolo_tpu.engine.double_inference import DoubleInference

        results = self.predict(source, **kwargs)
        return DoubleInference(self.model, self.variables)(results)

    def save(self, path: str | Path):
        from experiment_yolo_tpu.engine.checkpoint import save_checkpoint

        save_checkpoint(path, self.model, self.variables)

    def load(self, weights: str | Path):
        """Transfer compatible weights from a checkpoint dir into this model.

        Counterpart of the reference's ``Model.load`` (engine/model.py:332),
        whose ``intersect_dicts`` keeps only name+shape-matching entries so
        a heads-swapped or different-nc checkpoint still seeds the shared
        trunk. Returns self (chainable, like the reference).
        """
        from experiment_yolo_tpu.engine.checkpoint import load_matching_variables

        if not self.variables:
            raise ValueError("load() requires a graph model (not an exported artifact)")
        self.variables, matched, total = load_matching_variables(weights, self.variables)
        from experiment_yolo_tpu.utils import LOGGER

        LOGGER.info(f"load: transferred {matched}/{total} variables from {weights}")
        self.predictor = None  # drop any jit cache bound to the old weights
        return self

    def fuse(self):
        """Conv+BN fusion — a compile-time no-op on TPU, kept for API parity.

        The reference eagerly folds BN into conv weights (``BaseModel.fuse``,
        nn/tasks.py:168) because torch eager mode would otherwise launch BN
        kernels per layer. Under jit, inference-mode BN is a constant
        scale+shift that XLA folds into the convolution epilogue during
        compilation (see nn/modules.py module docstring), so the fused model
        IS the compiled model. Returns self.
        """
        return self

    def profile(self, imgsz: int = 640, verbose: bool = True):
        """Per-layer FLOPs/params table (reference Model.profile,
        engine/model.py:764 -> _profile_one_layer nn/tasks.py:136)."""
        if not hasattr(self.model, "profile"):
            raise ValueError(f"profile() unsupported for {type(self.model).__name__}")
        return self.model.profile(self.variables, imgsz=imgsz, verbose=verbose)

    def embed(self, source, imgsz: int = 640, batch: int = 8):
        """L2-normalized pooled embeddings of the head's input feature maps.

        Counterpart of the reference's ``Model.embed`` (engine/model.py:357
        ``embed=`` routing; predictor returns pooled feature tensors). Images
        are letterboxed to ``imgsz``; each returned row is the concatenation
        of the per-level global-average-pooled detect-input maps (same taps
        the Explorer indexes on), unit-normalized — ready for similarity
        search. Returns (N, D) numpy.
        """
        import numpy as np

        from experiment_yolo_tpu.data.augment import letterbox
        from experiment_yolo_tpu.data.explorer import make_embed_fn
        from experiment_yolo_tpu.engine.predictor import load_source

        if not hasattr(self.model, "specs"):
            raise ValueError("embed() requires a graph detection model")
        if getattr(self, "_embed_fn", None) is None:  # jit once, reuse across calls
            self._embed_fn = make_embed_fn(self.model)
        _embed = self._embed_fn
        frames = [letterbox(img, (imgsz, imgsz))[0][..., ::-1] for _, img in load_source(source)]
        out = []
        for s in range(0, len(frames), batch):
            chunk = np.stack(frames[s : s + batch])
            if len(chunk) < batch:  # static batch shape: pad, slice after
                chunk = np.concatenate([chunk, np.zeros((batch - len(chunk), *chunk.shape[1:]), chunk.dtype)])
            e = jax.device_get(_embed(self.variables, jnp.asarray(chunk)))
            out.append(e[: min(batch, len(frames) - s)])
        return np.concatenate(out, 0)
