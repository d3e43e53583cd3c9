"""`yolo-tpu` command-line interface.

Rebuild of the reference's ``yolo`` entrypoint
(ultralytics/cfg/__init__.py:426-573): ``yolo-tpu MODE key=value ...``
with the same mode set (train/val/predict/track/export/benchmark) and
special commands (version/checks/settings/cfg/copy-cfg/login/logout) plus
the TPU-native ``serve`` mode, using the same k=v override grammar.
"""

from __future__ import annotations

import sys
from typing import Any, Dict, List

from experiment_yolo_tpu.cfg import DEFAULT_CFG_DICT, check_dict_alignment
from experiment_yolo_tpu.utils import LOGGER, colorstr

MODES = ("train", "val", "predict", "track", "export", "benchmark", "serve",
         "cfg", "version", "checks", "settings", "copy-cfg", "explorer", "login", "logout")

USAGE = f"""
    yolo-tpu MODE ARGS

    Where MODE in {MODES} and ARGS are key=value pairs, e.g.:

        yolo-tpu train model=yolov8-LD-P2.yaml data=data.yaml epochs=100 imgsz=640
        yolo-tpu predict model=runs/detect/train/weights/best source=imgs/ conf=0.25
        yolo-tpu val model=runs/detect/train/weights/best data=data.yaml
        yolo-tpu benchmark model=yolov8n.yaml imgsz=640
        yolo-tpu track model=runs/detect/train/weights/best source=video.mp4
        yolo-tpu export model=runs/detect/train/weights/best format=onnx imgsz=640
        yolo-tpu settings [key=value ...]   # show / persist settings
        yolo-tpu explorer data=datasets/coco8 similar=0 topk=5
        yolo-tpu version | checks | copy-cfg | login api_key=... | logout
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
    if mode == "version":
        from experiment_yolo_tpu import __version__

        LOGGER.info(__version__)
        return __version__
    if mode == "checks":
        # environment report (reference: yolo checks -> checks.collect_system_info)
        import platform

        import jax

        LOGGER.info(f"python {platform.python_version()} on {platform.platform()}")
        LOGGER.info(f"jax {jax.__version__}, default backend: {jax.default_backend()}")
        for d in jax.devices():
            LOGGER.info(f"  device: {d}")
        return None
    if mode == "settings":
        from experiment_yolo_tpu.utils import SettingsManager

        s = SettingsManager()
        updates = parse_key_value(rest)
        if updates:
            unknown = set(updates) - set(s)
            if unknown:
                raise SyntaxError(f"unknown settings key(s): {sorted(unknown)}")
            s.update(updates)
            s.save()
        for k, v in s.items():
            LOGGER.info(f"{k}={v}")
        return dict(s)
    if mode == "copy-cfg":
        # copy default.yaml next to the user for editing (reference copy_default_cfg)
        import shutil
        from pathlib import Path

        from experiment_yolo_tpu.cfg import DEFAULT_CFG_PATH

        dst = Path.cwd() / (DEFAULT_CFG_PATH.stem + "_copy.yaml")
        shutil.copy2(DEFAULT_CFG_PATH, dst)
        LOGGER.info(f"{DEFAULT_CFG_PATH} copied to {dst}\n"
                    f"Use with: yolo-tpu train cfg={dst.name} model=... data=...")
        return dst
    if mode == "explorer":
        # headless dataset explorer (reference `yolo explorer` launches a
        # streamlit GUI; the TPU build answers the same queries on the CLI)
        kv = parse_key_value(rest)
        data = kv.get("data")
        if not data:
            raise SyntaxError("usage: yolo-tpu explorer data=<dataset dir> "
                              "[model=...yaml] [similar=<idx|image path>] [topk=5] [imgsz=256] "
                              "[sql=\"WHERE labels LIKE '%person%'\"] [plot=out.jpg]")
        from experiment_yolo_tpu import YOLO
        from experiment_yolo_tpu.data.explorer import Explorer

        m = YOLO(kv.get("model", "yolov8n.yaml"))
        ex = Explorer(data, m.model, m.variables, imgsz=int(kv.get("imgsz", 256)),
                      names=getattr(m, "names", None))
        sql = kv.get("sql")
        if sql is not None:  # label-only query: no need to embed the dataset
            if kv.get("plot"):
                ex.plot_sql_query(str(sql), save_path=str(kv["plot"]))
                LOGGER.info(f"explorer: query figure saved to {kv['plot']}")
            rows = ex.sql_query(str(sql))
            for r in rows:
                LOGGER.info(f"  #{r['idx']} {r['im_file']} labels={r['labels']}")
            LOGGER.info(f"explorer: {len(rows)} rows matched")
            return rows
        ex.build()
        LOGGER.info(f"class counts: {ex.class_counts()}")
        sim = kv.get("similar")
        hits = None
        if sim is not None:
            if isinstance(sim, int):
                hits = ex.similar(sim, topk=int(kv.get("topk", 5)))
            else:
                import cv2

                img = cv2.imread(str(sim))
                if img is None:
                    raise SyntaxError(f"cannot read query image {sim!r}")
                hits = ex.similar_to_image(img, topk=int(kv.get("topk", 5)))
            for j, s, f in hits:
                LOGGER.info(f"  #{j} sim={s:.3f} {f}")
        return hits if hits is not None else ex.embeddings
    if mode in ("login", "logout"):
        from experiment_yolo_tpu.utils import SettingsManager

        s = SettingsManager()
        if mode == "login":
            if rest and "=" not in rest[0]:  # bare token: yolo-tpu login KEY
                key = rest[0]
            else:
                key = parse_key_value(rest).get("api_key")
            if not key:
                raise SyntaxError("usage: yolo-tpu login api_key=YOUR_KEY")
            s["api_key"] = key
            LOGGER.info("HUB api_key saved")
        else:
            s.pop("api_key", None)
            LOGGER.info("HUB api_key removed")
        s.save()
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
    extra = {"track": {"tracker": None, "persist": None},
             "export": {"format": None, "path": None, "int8": None}}.get(mode, {})
    check_dict_alignment({**DEFAULT_CFG_DICT, "model": None, "source": None, **extra}, overrides)

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
    if mode == "track":
        if source is None:
            raise SyntaxError("'source=' is required for track")
        tracker = overrides.pop("tracker", "bytetrack")
        results = model.track(source, tracker=tracker, **overrides)
        LOGGER.info(f"{colorstr('track:')} {len(results)} frames")
        for r in results:
            ids = r.track_ids if len(r.track_ids) else []
            LOGGER.info(f"  {r.path}: {len(r.boxes)} tracks {list(ids)}")
        return results
    if mode == "export":
        fmt = overrides.pop("format", "stablehlo")
        path = overrides.pop("path", "model_export")
        out = model.export(fmt, path=path, **{k: v for k, v in overrides.items()
                                              if k in ("imgsz", "batch", "int8", "half", "data")})
        LOGGER.info(f"{colorstr('export:')} {out}")
        return out
    if mode == "benchmark":
        return model.benchmark(**overrides)
    return None


if __name__ == "__main__":
    entrypoint()
