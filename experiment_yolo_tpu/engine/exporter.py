"""Model export: StableHLO, TF SavedModel, TFLite.

Counterpart of the reference's ``engine/exporter.py`` (13 formats around
torch tracing). The TPU-native export surface is the XLA ecosystem:

- **stablehlo** — ``jax.export`` serialized MLIR; the portable artifact for
  any XLA runtime (servers, IREE, PJRT plugins).
- **saved_model** — jax2tf-converted TF SavedModel (TF Serving, TF Hub).
- **tflite** — TFLite flatbuffer via the TF converter (edge devices; the
  reference's tflite/edgetpu path).

The exported function is the full fused predict path: uint8 NHWC batch ->
normalize -> backbone -> DFL decode -> (boxes, scores). NMS stays outside
(deployment-specific thresholds), same as the reference's ONNX export.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.utils import LOGGER

FORMATS = ("stablehlo", "saved_model", "tflite", "onnx")


class Exporter:
    def __init__(self, model, variables, imgsz: int = 640, batch: int = 1):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.batch = batch

    def _predict_fn(self):
        model, variables = self.model, self.variables

        def fn(img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            boxes, scores = model.predict(variables, x)
            return boxes, scores

        return fn

    def _example_input(self):
        return jnp.zeros((self.batch, self.imgsz, self.imgsz, 3), jnp.uint8)

    def __call__(self, fmt: str, path: str | Path) -> Path:
        fmt = fmt.lower()
        path = Path(path)
        if fmt == "stablehlo":
            return self.export_stablehlo(path)
        if fmt == "saved_model":
            return self.export_saved_model(path)
        if fmt == "tflite":
            return self.export_tflite(path)
        if fmt == "onnx":
            return self.export_onnx(path)
        raise ValueError(f"unknown export format {fmt!r}; expected one of {FORMATS}")

    def export_onnx(self, path: Path) -> Path:
        """ONNX (opset 17) via our jaxpr->ONNX compiler.

        The reference's primary interchange format (its exporter.py:341);
        here the jitted predict jaxpr is compiled to ONNX ops with trained
        weights as initializers — no onnx/tf2onnx dependency (the protobuf
        is written by export/onnx_proto.py).
        """
        from experiment_yolo_tpu.export.onnx_export import export_jaxpr_to_onnx

        closed = jax.make_jaxpr(self._predict_fn())(self._example_input())
        path = path.with_suffix(".onnx")
        path.parent.mkdir(parents=True, exist_ok=True)
        blob = export_jaxpr_to_onnx(
            closed, ["images"], ["boxes", "scores"], path=path,
            graph_name=type(self.model).__name__,
        )
        LOGGER.info(f"export: onnx -> {path} ({len(blob) / 1e6:.1f} MB)")
        return path

    def export_stablehlo(self, path: Path) -> Path:
        """Serialize the jitted predict path as portable StableHLO."""
        from jax import export as jexport

        exported = jexport.export(jax.jit(self._predict_fn()))(self._example_input())
        blob = exported.serialize()
        path = path.with_suffix(".stablehlo")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(blob)
        LOGGER.info(f"export: stablehlo -> {path} ({len(blob) / 1e6:.1f} MB)")
        return path

    def _tf_module(self):
        import tensorflow as tf
        from jax.experimental import jax2tf

        fn_tf = jax2tf.convert(self._predict_fn(), with_gradient=False)
        module = tf.Module()
        module.f = tf.function(
            fn_tf,
            autograph=False,
            input_signature=[tf.TensorSpec((self.batch, self.imgsz, self.imgsz, 3), tf.uint8)],
        )
        return module

    def export_saved_model(self, path: Path) -> Path:
        import tensorflow as tf

        module = self._tf_module()
        path.parent.mkdir(parents=True, exist_ok=True)
        tf.saved_model.save(module, str(path))
        LOGGER.info(f"export: saved_model -> {path}")
        return path

    def export_tflite(self, path: Path) -> Path:
        import tensorflow as tf

        module = self._tf_module()
        converter = tf.lite.TFLiteConverter.from_concrete_functions(
            [module.f.get_concrete_function()], module
        )
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        blob = converter.convert()
        path = path.with_suffix(".tflite")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(blob)
        LOGGER.info(f"export: tflite -> {path} ({len(blob) / 1e6:.1f} MB)")
        return path


def load_stablehlo(path: str | Path):
    """Reload a serialized StableHLO export as a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call
