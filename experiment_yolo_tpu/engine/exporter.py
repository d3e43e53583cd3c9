"""Model export: StableHLO, TF SavedModel, TFLite.

Counterpart of the reference's ``engine/exporter.py`` (13 formats around
torch tracing). The TPU-native export surface is the XLA ecosystem:

- **stablehlo** — ``jax.export`` serialized MLIR; the portable artifact for
  any XLA runtime (servers, IREE, PJRT plugins).
- **saved_model** — jax2tf-converted TF SavedModel (TF Serving, TF Hub).
- **tflite** — TFLite flatbuffer via the TF converter (edge devices; the
  reference's tflite/edgetpu path).
- **pb / tfjs / edgetpu** — derived from the saved_model path like the
  reference's (exporter.py:91): frozen GraphDef always works; tfjs and
  edgetpu need their converter tool (clear install hint when absent, with
  the convertible half already written).

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

FORMATS = ("stablehlo", "saved_model", "tflite", "onnx", "pb", "tfjs", "edgetpu")


class Exporter:
    def __init__(self, model, variables, imgsz: int = 640, batch: int = 1):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.batch = batch

    # per-task output names for the ONNX graph (tuple order of each task
    # model's predict(); reference exporter names its ONNX outputs the
    # same way, exporter.py output_names)
    _OUTPUT_NAMES = {
        "detect": ["boxes", "scores"],
        "segment": ["boxes", "scores", "coeffs", "protos"],
        "pose": ["boxes", "scores", "kpts"],
        "obb": ["rboxes", "scores"],
        "classify": ["probs"],
    }

    def _output_names(self):
        task = getattr(self.model, "task", "detect")
        return self._OUTPUT_NAMES.get(task, ["out0", "out1"])

    def _write_meta(self, artifact: Path) -> None:
        """Sidecar ``<artifact>.meta.json`` for formats whose serialization
        carries no metadata (stablehlo/tflite/saved_model); ONNX embeds the
        same fields in the model doc string. AutoBackend reads this back so
        a non-detect artifact is routed (or refused) by task instead of
        silently postprocessed as detect."""
        import json

        names = getattr(self.model, "names", None)
        meta = {
            "task": getattr(self.model, "task", "detect"),
            "head_type": getattr(self.model, "head_type", ""),
            "nc": int(getattr(self.model, "nc", 0) or 0),
            "names": {int(k): str(v) for k, v in names.items()} if isinstance(names, dict) else None,
        }
        Path(str(artifact) + ".meta.json").write_text(json.dumps(meta))

    def _predict_fn(self):
        model, variables = self.model, self.variables

        def fn(img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            out = model.predict(variables, x)
            return out if isinstance(out, tuple) else (out,)

        return fn

    def _example_input(self):
        return jnp.zeros((self.batch, self.imgsz, self.imgsz, 3), jnp.uint8)

    def __call__(self, fmt: str, path: str | Path, int8: bool = False,
                 half: bool = False, data=None) -> Path:
        fmt = fmt.lower()
        path = Path(path)
        if fmt == "stablehlo":
            return self.export_stablehlo(path)
        if fmt == "saved_model":
            return self.export_saved_model(path)
        if fmt == "tflite":
            return self.export_tflite(path, int8=int8, half=half, data=data)
        if fmt == "onnx":
            return self.export_onnx(path)
        if fmt == "pb":
            return self.export_pb(path)
        if fmt == "tfjs":
            return self.export_tfjs(path)
        if fmt == "edgetpu":
            return self.export_edgetpu(path, data=data)
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
        # task/head metadata in the doc string: AutoBackend reads it back so
        # exported RT-DETR artifacts validate with the right protocol
        doc = (f"task={getattr(self.model, 'task', 'detect')};"
               f"head_type={getattr(self.model, 'head_type', '')};"
               f"nc={getattr(self.model, 'nc', 0)}")
        blob = export_jaxpr_to_onnx(
            closed, ["images"], self._output_names(), path=path,
            graph_name=type(self.model).__name__, doc=doc,
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
        self._write_meta(path)
        LOGGER.info(f"export: stablehlo -> {path} ({len(blob) / 1e6:.1f} MB)")
        return path

    def _tf_module(self):
        import tensorflow as tf
        from jax.experimental import jax2tf

        # Without an explicit platform list, jax2tf bakes the exporting
        # process's default backend into the StableHLO module — an export
        # run on the TPU host then fails on every CPU consumer with "The
        # current platform CPU is not among the platforms required".
        # These artifacts are deployment interchange: embed both lowerings.
        fn_tf = jax2tf.convert(self._predict_fn(), with_gradient=False,
                               native_serialization_platforms=("cpu", "tpu"))
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
        self._write_meta(path)
        LOGGER.info(f"export: saved_model -> {path}")
        return path

    def export_tflite(self, path: Path, int8: bool = False, half: bool = False,
                      data=None) -> Path:
        """TFLite flatbuffer; optional post-training quantization.

        ``int8`` runs full post-training quantization with a representative
        dataset (reference exporter.py ``int8=True`` / its edgetpu
        prerequisite; the reference calibrates on ~100 dataset images —
        pass ``data`` as an iterable of uint8 NHWC arrays to mirror that,
        otherwise random calibration batches are used with a warning).
        ``half`` targets fp16 weights (reference ``half=True``).
        """
        import tensorflow as tf

        module = self._tf_module()
        converter = tf.lite.TFLiteConverter.from_concrete_functions(
            [module.f.get_concrete_function()], module
        )
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        if int8:
            shape = (self.batch, self.imgsz, self.imgsz, 3)

            def _rep():
                n = 0
                if data is not None:
                    for arr in data:
                        a = np.asarray(arr, np.uint8).reshape(shape)
                        yield [a]
                        n += 1
                        if n >= 100:
                            return
                if n == 0:
                    LOGGER.warning(
                        "export: int8 calibration with RANDOM data — pass "
                        "`data=` (iterable of uint8 NHWC batches) for real ranges"
                    )
                    rng = np.random.RandomState(0)
                    for _ in range(32):
                        yield [rng.randint(0, 255, shape, np.uint8)]

            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.representative_dataset = _rep
            # keep uint8 input / float output like the reference's int8
            # tflite artifacts (inference_input_type uint8, outputs float)
            converter.inference_input_type = tf.uint8
        elif half:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.target_spec.supported_types = [tf.float16]
        blob = converter.convert()
        path = path.with_suffix(".tflite")
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(blob)
        self._write_meta(path)
        LOGGER.info(f"export: tflite -> {path} ({len(blob) / 1e6:.1f} MB)")
        return path


    def export_pb(self, path: Path) -> Path:
        """Frozen TF GraphDef (.pb) — the reference's ``format='pb'``
        (its exporter.py:91 row 'TensorFlow GraphDef'): the saved_model
        concrete function with variables folded into constants."""
        import tensorflow as tf
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2,
        )

        module = self._tf_module()
        frozen = convert_variables_to_constants_v2(module.f.get_concrete_function())
        path = path.with_suffix(".pb")
        path.parent.mkdir(parents=True, exist_ok=True)
        tf.io.write_graph(frozen.graph.as_graph_def(), str(path.parent), path.name,
                          as_text=False)
        self._write_meta(path)
        LOGGER.info(f"export: pb -> {path} ({path.stat().st_size / 1e6:.1f} MB)")
        return path

    def export_tfjs(self, path: Path) -> Path:
        """TensorFlow.js graph model (reference ``format='tfjs'``,
        exporter.py:91): saved_model -> tfjs via the tensorflowjs converter.
        The converter package doesn't ship in this image, so without it this
        exports the saved_model and raises a clear install hint."""
        sm = self.export_saved_model(path.with_name(path.name + "_saved_model"))
        try:
            from tensorflowjs.converters import convert_tf_saved_model  # type: ignore
        except ImportError:
            raise ImportError(
                f"tfjs export needs the 'tensorflowjs' package (pip install "
                f"tensorflowjs). The SavedModel half is ready at {sm} — run "
                f"`tensorflowjs_converter --input_format=tf_saved_model {sm} "
                f"{path}` once installed."
            ) from None
        path.mkdir(parents=True, exist_ok=True)
        convert_tf_saved_model(str(sm), str(path))
        self._write_meta(path / "model.json")
        LOGGER.info(f"export: tfjs -> {path}")
        return path

    def export_edgetpu(self, path: Path, data=None) -> Path:
        """Edge TPU .tflite (reference ``format='edgetpu'``, exporter.py:91):
        int8 tflite compiled by the ``edgetpu_compiler`` binary. Without the
        compiler on PATH this still writes the int8 tflite and raises a
        clear install hint (the reference hard-requires the binary too,
        its exporter.py export_edgetpu)."""
        import shutil
        import subprocess

        tfl = self.export_tflite(path.with_name(path.stem + "_int8"), int8=True,
                                 data=data)
        if not shutil.which("edgetpu_compiler"):
            raise RuntimeError(
                f"edgetpu export needs the 'edgetpu_compiler' binary "
                f"(https://coral.ai/docs/edgetpu/compiler/). The int8 tflite "
                f"half is ready at {tfl} — run `edgetpu_compiler -s {tfl}` "
                f"once installed."
            )
        subprocess.run(["edgetpu_compiler", "-s", "-d", "-k", "10",
                        "-o", str(tfl.parent), str(tfl)], check=True)
        out = tfl.with_name(tfl.stem + "_edgetpu.tflite")
        self._write_meta(out)
        LOGGER.info(f"export: edgetpu -> {out}")
        return out


def load_stablehlo_exported(path: str | Path):
    """Reload a serialized StableHLO export (jax.export.Exported — exposes
    in_avals for shape introspection alongside .call)."""
    from jax import export as jexport

    return jexport.deserialize(Path(path).read_bytes())


def load_stablehlo(path: str | Path):
    """Reload a serialized StableHLO export as a callable."""
    return load_stablehlo_exported(path).call
