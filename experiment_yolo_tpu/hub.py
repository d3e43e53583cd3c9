"""HUB training session (reference hub/session.py:17 HUBTrainingSession +
utils/callbacks/hub.py): heartbeat thread, rate-limited metric queue, and
checkpoint upload on the fit/save callbacks.

The reference talks to the Ultralytics SaaS; this TPU build reproduces the
session contract against a pluggable endpoint: a local directory (default —
metrics and checkpoints land as JSON/files, heartbeats touch a status file)
or any HTTP endpoint via the same `_request` hook. The trainer-facing
surface (`create_session` -> callbacks `on_fit_epoch_end`,
`on_model_save`) matches the reference's callback wiring."""

from __future__ import annotations

import json
import shutil
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional


class HUBTrainingSession:
    """Rate-limited metric/checkpoint publisher with a heartbeat thread."""

    metric_rate_limit = 3.0  # seconds (reference: rate_limits['metrics'])
    ckpt_rate_limit = 900.0
    heartbeat_interval = 300.0

    def __init__(self, model_id: str, root: str | Path = "runs/hub", agent: str = "local"):
        self.model_id = model_id
        self.root = Path(root) / model_id
        self.root.mkdir(parents=True, exist_ok=True)
        self.agent = agent
        self.metrics_queue: Dict[int, dict] = {}
        self._last_metric = 0.0
        self._last_ckpt = 0.0
        self.alive = True
        self._hb = threading.Thread(target=self._heartbeat, daemon=True)
        self._hb.start()

    # -- transport (override for a real HTTP endpoint) ---------------------
    def _request(self, kind: str, payload: Any) -> None:
        if kind == "metrics":
            path = self.root / "metrics.jsonl"
            with open(path, "a") as f:
                for epoch, m in payload.items():
                    f.write(json.dumps({"epoch": epoch, **m}) + "\n")
        elif kind == "heartbeat":
            (self.root / "heartbeat.json").write_text(
                json.dumps({"agent": self.agent, "t": time.time(), "alive": self.alive}))
        elif kind == "ckpt":
            src, meta = payload
            dst = self.root / ("best.ckpt" if meta.get("is_best") else f"epoch{meta['epoch']}.ckpt")
            if Path(src).is_dir():
                if dst.exists():
                    shutil.rmtree(dst)
                shutil.copytree(src, dst)
            elif Path(src).exists():
                shutil.copy2(src, dst)
            (self.root / "last_upload.json").write_text(json.dumps(meta))

    def _heartbeat(self) -> None:
        while self.alive:
            try:
                self._request("heartbeat", None)
            except Exception:
                pass
            # short sleep slices so shutdown is prompt
            for _ in range(int(self.heartbeat_interval / 0.5)):
                if not self.alive:
                    return
                time.sleep(0.5)

    # -- callback surface (reference utils/callbacks/hub.py) ---------------
    def upload_metrics(self, epoch: int, metrics: Dict[str, float]) -> None:
        self.metrics_queue[int(epoch)] = {k: float(v) for k, v in metrics.items()
                                          if isinstance(v, (int, float))}
        now = time.time()
        if now - self._last_metric > self.metric_rate_limit:
            self._request("metrics", self.metrics_queue)
            self.metrics_queue = {}
            self._last_metric = now

    def upload_model(self, epoch: int, weights: str | Path, is_best: bool = False,
                     final: bool = False) -> None:
        now = time.time()
        if final or is_best or now - self._last_ckpt > self.ckpt_rate_limit:
            self._request("ckpt", (weights, {"epoch": int(epoch), "is_best": bool(is_best),
                                             "final": bool(final)}))
            self._last_ckpt = now

    def shutdown(self) -> None:
        if self.metrics_queue:
            self._request("metrics", self.metrics_queue)
            self.metrics_queue = {}
        self.alive = False


def create_session(model_id: str, root: str | Path = "runs/hub") -> HUBTrainingSession:
    return HUBTrainingSession(model_id, root)


def add_hub_callbacks(callbacks, session: HUBTrainingSession) -> None:
    """Register the hub upload hooks (reference utils/callbacks/hub.py)."""

    def on_fit_epoch_end(trainer=None, **kw):
        if trainer is None:
            return
        metrics = {**getattr(trainer, "loss_items", {}), **getattr(trainer, "metrics", {})}
        session.upload_metrics(getattr(trainer, "epoch", 0), metrics)

    def on_model_save(trainer=None, **kw):
        if trainer is None:
            return
        w = Path(getattr(trainer, "save_dir", "runs")) / "weights" / "last"
        session.upload_model(getattr(trainer, "epoch", 0), w,
                             is_best=bool(getattr(trainer, "best_fitness_updated", False)))

    def on_train_end(trainer=None, **kw):
        if trainer is not None:
            w = Path(getattr(trainer, "save_dir", "runs")) / "weights" / "best"
            session.upload_model(getattr(trainer, "epoch", 0), w, is_best=True, final=True)
        session.shutdown()

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
    callbacks.add("on_model_save", on_model_save)
    callbacks.add("on_train_end", on_train_end)


class TritonRemoteModel:
    """Minimal Triton HTTP client (reference utils/triton.py:TritonRemoteModel):
    reads model config from the server, sends named numpy inputs, returns
    named outputs. Pure-stdlib HTTP; raises a clear error offline."""

    _DTYPES = {"FP32": "float32", "FP16": "float16", "INT32": "int32", "INT64": "int64",
               "UINT8": "uint8", "BOOL": "bool"}

    def __init__(self, url: str, endpoint: str = "", scheme: str = "http"):
        if "/" in url and not endpoint:
            scheme, rest = url.split("://", 1)
            parts = rest.split("/")
            url, endpoint = parts[0], parts[-1]
        self.url = f"{scheme}://{url}"
        self.endpoint = endpoint
        cfg = self._get(f"/v2/models/{endpoint}/config")
        self.inputs = cfg["input"]
        self.outputs = cfg["output"]

    def _get(self, path: str) -> dict:
        import urllib.request

        with urllib.request.urlopen(self.url + path, timeout=10) as r:
            return json.loads(r.read())

    def __call__(self, *arrays):
        import urllib.request

        import numpy as np

        payload = {
            "inputs": [
                {"name": spec["name"], "shape": list(a.shape),
                 "datatype": spec["data_type"].replace("TYPE_", ""),
                 "data": np.asarray(a).reshape(-1).tolist()}
                for spec, a in zip(self.inputs, arrays)
            ],
            "outputs": [{"name": o["name"]} for o in self.outputs],
        }
        req = urllib.request.Request(
            f"{self.url}/v2/models/{self.endpoint}/infer",
            data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"})
        import numpy as np

        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        res = []
        for o in out["outputs"]:
            dt = self._DTYPES.get(o["datatype"], "float32")
            res.append(np.asarray(o["data"], dtype=dt).reshape(o["shape"]))
        return res if len(res) > 1 else res[0]
