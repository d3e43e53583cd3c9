"""AutoBackend: uniform inference interface over model formats.

Rebuild of the reference's ``nn/autobackend.py:53`` (13 torch-world
runtimes) for the XLA world's formats:

- **yaml**  — fresh DetectionModel (random init; for benchmarking)
- **checkpoint dir** — orbax weights (EMA preferred)
- **.stablehlo** — a serialized ``jax.export`` artifact (deployment)
- **.tflite** — runs through the TFLite interpreter (edge parity checks)
- **.onnx** — runs through onnxruntime when installed, else the framework's
  pure-numpy interpreter (export/onnx_runtime_np.py; correctness checks,
  not speed)

Every backend exposes ``forward(uint8 NHWC batch) -> (boxes, scores)`` in
input-pixel units, plus ``names``/``nc`` metadata, so the predictor and
validator are backend-agnostic.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.utils import LOGGER


class AutoBackend:
    def __init__(self, model: str | Path, nc: Optional[int] = None, dtype=jnp.float32):
        src = str(model)
        self.format = self._model_type(src)
        self.names: Dict[int, str] = {}
        self.nc = nc or 0
        self.input_shape = None  # (B, H, W, C) for fixed-shape artifacts
        self.task = "detect"
        self.head_type = ""
        self.output_names: list = []
        if self.format == "yaml":
            from experiment_yolo_tpu.nn.tasks import DetectionModel

            self.model = DetectionModel(src, nc=nc, dtype=dtype)
            self.variables = self.model.init(jax.random.PRNGKey(0))
            self.nc = self.model.nc
            self.names = self.model.names
            self.task = getattr(self.model, "task", "detect")
        elif self.format == "checkpoint":
            from experiment_yolo_tpu.engine.checkpoint import load_checkpoint

            self.model, self.variables = load_checkpoint(src, dtype=dtype)
            self.nc = self.model.nc
            self.names = self.model.names
            self.task = getattr(self.model, "task", "detect")
        elif self.format == "stablehlo":
            from experiment_yolo_tpu.engine.exporter import load_stablehlo_exported

            exported = load_stablehlo_exported(src)
            self._fn = exported.call
            if exported.in_avals:
                self.input_shape = tuple(int(d) for d in exported.in_avals[0].shape)
            self._read_sidecar_meta(src)
        elif self.format == "saved_model":
            import tensorflow as tf

            self._tf_mod = tf.saved_model.load(src)
            spec = self._tf_mod.f.input_signature[0]
            self.input_shape = tuple(int(d) for d in spec.shape)
            self._read_sidecar_meta(src)
        elif self.format == "pb":
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(Path(src).read_bytes())
            # frozen-graph IO discovery (reference autobackend.py gd_outputs):
            # inputs are the Placeholder ops; outputs are nodes nobody consumes
            consumed = {i.split(":")[0].lstrip("^") for n in gd.node for i in n.input}
            in_names = [n.name for n in gd.node if n.op == "Placeholder"]
            out_names = [n.name for n in gd.node
                         if n.name not in consumed and n.op != "NoOp"]
            wrapped = tf.compat.v1.wrap_function(
                lambda: tf.compat.v1.import_graph_def(gd, name=""), []
            )
            ge = wrapped.graph.as_graph_element
            self._pb_fn = wrapped.prune(
                [ge(f"{n}:0") for n in in_names], [ge(f"{n}:0") for n in out_names]
            )
            self.input_shape = tuple(
                int(d) for d in self._pb_fn.inputs[0].shape
            ) if self._pb_fn.inputs[0].shape.rank else None
            self._read_sidecar_meta(src)
        elif self.format == "tflite":
            import tensorflow as tf

            self._interp = tf.lite.Interpreter(model_path=src)
            self._interp.allocate_tensors()
            self.input_shape = tuple(
                int(d) for d in self._interp.get_input_details()[0]["shape"]
            )
            self._read_sidecar_meta(src)
        elif self.format == "onnx":
            from experiment_yolo_tpu.export import onnx_proto as _P

            self._onnx_blob = Path(src).read_bytes()
            parsed = _P.parse_model(self._onnx_blob)
            self._onnx_parsed = parsed  # run_onnx per frame: parse ONCE
            ins = parsed["graph"]["inputs"]
            self.input_shape = tuple(ins[0]["dims"]) if ins else None
            self._onnx_input = ins[0]["name"] if ins else "images"
            self.output_names = [o["name"] for o in parsed["graph"]["outputs"]]
            # exporter-written metadata (task=...;head_type=...;nc=...)
            for kv in (parsed.get("doc") or "").split(";"):
                k, _, val = kv.partition("=")
                if k == "task" and val:
                    self.task = val
                elif k == "head_type" and val:
                    self.head_type = val
                elif k == "nc" and val.isdigit() and not self.nc:
                    self.nc = int(val)
            try:  # pragma: no cover - onnxruntime absent in this env
                import onnxruntime as ort

                self._ort = ort.InferenceSession(src)
            except ImportError:
                self._ort = None
        else:
            raise ValueError(f"unsupported model source {src!r}")
        if not self.names and self.nc:
            self.names = {i: str(i) for i in range(self.nc)}

    def _read_sidecar_meta(self, src: str) -> None:
        """Read ``<artifact>.meta.json`` (written by the Exporter for the
        formats whose serialization carries no metadata — stablehlo/tflite;
        ONNX embeds the same fields in its doc string)."""
        import json

        p = Path(str(src) + ".meta.json")
        if not p.exists():
            return
        meta = json.loads(p.read_text())
        self.task = meta.get("task") or self.task
        self.head_type = meta.get("head_type") or self.head_type
        if not self.nc and meta.get("nc"):
            self.nc = int(meta["nc"])
        if meta.get("names"):
            self.names = {int(k): str(v) for k, v in meta["names"].items()}

    @staticmethod
    def _model_type(src: str) -> str:
        p = Path(src)
        if src.endswith((".yaml", ".yml")):
            return "yaml"
        if src.endswith(".stablehlo"):
            return "stablehlo"
        if src.endswith(".tflite"):
            return "tflite"
        if src.endswith(".onnx"):
            return "onnx"
        if src.endswith(".pb") and p.is_file():
            return "pb"
        if p.is_dir() and (p / "saved_model.pb").exists():
            return "saved_model"
        if p.is_dir() and (p / "meta.yaml").exists():
            return "checkpoint"
        return "unknown"

    def forward(self, imgs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 NHWC batch -> (boxes xywh pixels (B,A,4), scores (B,A,nc)).

        Task models (``self.task`` != 'detect') return their first two
        predict outputs here — boxes are rboxes (B,A,5) for obb; callers
        needing the task extras (coeffs/protos/kpts) should use the graph
        model's predict directly.
        """
        if self.format in ("yaml", "checkpoint"):
            x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
            out = self.model.predict(self.variables, x)
            out = out if isinstance(out, tuple) else (out,)
            if len(out) == 1:  # classify: single probs tensor
                return np.asarray(out[0]), np.asarray(out[0])
            return np.asarray(out[0]), np.asarray(out[1])
        if self.format == "stablehlo":
            out = self._fn(jnp.asarray(imgs))
            out = out if isinstance(out, (tuple, list)) else (out,)
            if len(out) == 1:
                return np.asarray(out[0]), np.asarray(out[0])
            return np.asarray(out[0]), np.asarray(out[1])
        if self.format == "saved_model":
            outs = self._tf_mod.f(np.asarray(imgs, np.uint8))
            outs = outs if isinstance(outs, (tuple, list)) else (outs,)
            if len(outs) == 1:
                return np.asarray(outs[0]), np.asarray(outs[0])
            return np.asarray(outs[0]), np.asarray(outs[1])
        if self.format == "pb":
            import tensorflow as tf

            # pruned frozen-graph funcs reject raw ndarrays (their flat
            # signature binds Tensors only)
            outs = self._pb_fn(tf.constant(np.asarray(imgs, np.uint8)))
            outs = outs if isinstance(outs, (tuple, list)) else (outs,)
            if len(outs) == 1:
                return np.asarray(outs[0]), np.asarray(outs[0])
            return np.asarray(outs[0]), np.asarray(outs[1])
        if self.format == "onnx":
            x = np.asarray(imgs, np.uint8)
            if self._ort is not None:  # pragma: no cover - env has no onnxruntime
                name = self._ort.get_inputs()[0].name
                outs = self._ort.run(None, {name: x})
            else:
                from experiment_yolo_tpu.export.onnx_runtime_np import run_onnx

                outs = run_onnx(self._onnx_parsed, {self._onnx_input: x})
            # graph outputs are emitted in deterministic order (boxes,
            # scores, ...): shape heuristics would misfire for nc=4 or OBB
            return np.asarray(outs[0]), np.asarray(outs[1])
        # tflite: uint8 in, (boxes, scores) out
        inp = self._interp.get_input_details()[0]
        self._interp.set_tensor(inp["index"], np.asarray(imgs, np.uint8))
        self._interp.invoke()
        dets = self._interp.get_output_details()
        outs = [self._interp.get_tensor(o["index"]) for o in dets]
        four = [o for o in outs if o.shape[-1] == 4]
        rest = [o for o in outs if o.shape[-1] != 4]
        if len(four) == 1 and rest:
            return four[0], rest[0]
        # ambiguous shapes (e.g. nc=4 detect: both outputs end in 4) — fall
        # back to the converter's signature order (Identity, Identity_1, ...)
        order = sorted(range(len(outs)), key=lambda i: dets[i]["name"])
        return outs[order[0]], outs[order[1]]

    def warmup(self, imgsz: int = 640, batch: int = 1) -> None:
        self.forward(np.zeros((batch, imgsz, imgsz, 3), np.uint8))


class BackendModel:
    """Model-shaped adapter over AutoBackend for the YOLO facade/predictor:
    exported artifacts (.stablehlo/.tflite/.onnx) predict through the same
    pipeline as live models, with the forward on the artifact's runtime and
    the NMS staying a jitted XLA program (reference: YOLO('model.onnx')
    routes through AutoBackend, engine/model.py:206 + predictor)."""

    def __init__(self, src, nc: Optional[int] = None):
        self.backend = AutoBackend(src, nc=nc)
        self.nc = self.backend.nc or (nc or 80)
        self.names = self.backend.names or {i: str(i) for i in range(self.nc)}
        self.strides = (8, 16, 32)  # nominal v8 pyramid (imgsz divisibility)
        sh = self.backend.input_shape
        # symbolic dims (external ONNX with dynamic axes) stay None
        self.batch = int(sh[0]) if sh and isinstance(sh[0], int) else None
        self.task = self.backend.task
        self.head_type = self.backend.head_type
        outs = self.backend.output_names
        if outs:  # output naming also identifies the task (our exporter's)
            by_name = {"rboxes": "obb", "kpts": "pose", "coeffs": "segment",
                       "probs": "classify"}
            for name, t in by_name.items():
                if name in outs:
                    self.task = t
        if self.task != "detect":
            raise NotImplementedError(
                f"exported-{self.task} artifacts have task-specific "
                "postprocess; run them via AutoBackend / the ONNX runtimes "
                "directly (predictor/validator artifact path is detect-only)"
            )

    def forward_host(self, imgs_u8: np.ndarray):
        """uint8 NHWC -> (boxes, scores) numpy; host-side entry (the
        artifact runtime is not jax-traceable)."""
        return self.backend.forward(np.asarray(imgs_u8, np.uint8))
