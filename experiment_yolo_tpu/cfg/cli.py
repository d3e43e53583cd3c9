"""`yolo-tpu` command-line interface.

Rebuild of the reference's ``yolo`` entrypoint
(ultralytics/cfg/__init__.py:426-573): ``yolo-tpu MODE key=value ...``
with modes train/val/predict/benchmark and the same k=v override grammar.
"""

from __future__ import annotations

import sys
from typing import Any, Dict, List

from experiment_yolo_tpu.cfg import DEFAULT_CFG_DICT, check_dict_alignment
from experiment_yolo_tpu.utils import LOGGER, colorstr

MODES = ("train", "val", "predict", "benchmark", "serve", "cfg")

USAGE = f"""
    yolo-tpu MODE ARGS

    Where MODE in {MODES} and ARGS are key=value pairs, e.g.:

        yolo-tpu train model=yolov8-LD-P2.yaml data=data.yaml epochs=100 imgsz=640
        yolo-tpu predict model=runs/detect/train/weights/best source=imgs/ conf=0.25
        yolo-tpu val model=runs/detect/train/weights/best data=data.yaml
        yolo-tpu benchmark model=yolov8n.yaml imgsz=640
        yolo-tpu cfg            # print default config
"""


def parse_key_value(args: List[str]) -> Dict[str, Any]:
    """Parse k=v tokens with YAML-ish scalar coercion."""
    import ast

    out: Dict[str, Any] = {}
    for a in args:
        if "=" not in a:
            raise SyntaxError(f"argument {a!r} is not key=value\n{USAGE}")
        k, v = a.split("=", 1)
        if v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        elif v.lower() in ("none", "null", ""):
            out[k] = None
        else:
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
    return out


def entrypoint(argv: List[str] | None = None) -> Any:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        LOGGER.info(USAGE)
        return None
    mode, *rest = argv
    if mode not in MODES:
        raise SyntaxError(f"invalid mode {mode!r}; expected one of {MODES}\n{USAGE}")
    if mode == "cfg":
        for k, v in DEFAULT_CFG_DICT.items():
            LOGGER.info(f"{k}={v}")
        return None

    overrides = parse_key_value(rest)
    model_src = overrides.pop("model", None)
    if model_src is None:
        raise SyntaxError(f"'model=' is required for mode {mode!r}\n{USAGE}")
    source = overrides.pop("source", None)
    if mode == "serve":
        # HTTP detection service with dynamic batching (serve.py)
        from experiment_yolo_tpu.serve import DetectionServer

        host = str(overrides.pop("host", "127.0.0.1"))
        port = int(overrides.pop("port", 8000))
        server = DetectionServer(model_src, **overrides)
        bound = server.start(host=host, port=port)
        LOGGER.info(f"{colorstr('serve:')} ready on {host}:{bound} — POST /predict, GET /health")
        try:
            server._http_thread.join()
        except KeyboardInterrupt:
            server.stop()
        return server
    check_dict_alignment({**DEFAULT_CFG_DICT, "model": None, "source": None}, overrides)

    from experiment_yolo_tpu import YOLO

    model = YOLO(model_src)
    if mode == "train":
        return model.train(**overrides)
    if mode == "val":
        return model.val(**overrides)
    if mode == "predict":
        if source is None:
            raise SyntaxError("'source=' is required for predict")
        results = model.predict(source, **overrides)
        LOGGER.info(f"{colorstr('predict:')} {len(results)} images")
        for r in results:
            LOGGER.info(f"  {r.path}: {len(r.boxes)} detections")
        return results
    if mode == "benchmark":
        return model.benchmark(**overrides)
    return None


if __name__ == "__main__":
    entrypoint()
