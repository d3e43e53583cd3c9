"""Image-classification task family.

Rebuild of the reference's classify pieces: the ``Classify`` head
(nn/modules/head.py:188), ``ClassificationModel`` (nn/tasks.py:421),
``ClassificationDataset`` (data/dataset.py:227, ImageFolder layout) and the
classify trainer/validator triple (models/yolo/classify/). Compact: one
module for the whole family, sharing the detection stack's optimizers and
EMA.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from experiment_yolo_tpu.data.dataset import IMG_FORMATS
from experiment_yolo_tpu.nn.modules import ConvBN
from experiment_yolo_tpu.nn.tasks import GraphModel, parse_model, yaml_model_load
from experiment_yolo_tpu.utils import LOGGER


class Classify(nn.Module):
    """Classification head: conv -> global pool -> dropout -> linear
    (reference head.py:188)."""

    nc: int
    c_: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        x = x.mean(axis=(1, 2))  # global average pool
        return nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32, name="linear")(x)


class ClassificationModel:
    """Backbone (from any detection yaml's backbone section) + Classify head."""

    task = "classify"

    def __init__(self, cfg: str | dict = "yolov8n.yaml", nc: int = 1000, dtype=jnp.float32):
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        self.nc = nc
        # reuse the detection backbone rows; replace the head with Classify
        d = dict(self.yaml)
        d = {**d, "head": [], "nc": nc}
        layers, save, _, _, _ = parse_model({**d, "backbone": self.yaml["backbone"]}, 3, scale=self.yaml.get("scale"), dtype=dtype)
        self.backbone = GraphModel(
            layers=tuple(s.module for s in layers),
            froms=tuple(s.f for s in layers),
            list_inputs=tuple(s.is_list_input for s in layers),
            save=tuple(save),
        )
        self.head = Classify(nc=nc, dtype=dtype)
        self.module = _ClsNet(self.backbone, self.head)

    def init(self, rng, imgsz: int = 64) -> dict:
        x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        return jax.jit(lambda r: self.module.init(r, x, False))(rng)

    def apply(self, variables, x, train: bool = False, mutable=False):
        return self.module.apply(variables, x, train, mutable=mutable)

    def predict(self, variables, x):
        """Softmax class probabilities (B, nc)."""
        return jax.nn.softmax(self.module.apply(variables, x, False), -1)

    # facade/predictor surface (reference ClassificationModel mirrors the
    # detection API): nominal stride for imgsz checks, names, param count
    strides = (32,)

    @property
    def names(self):
        return {i: str(i) for i in range(self.nc)}

    def num_params(self, variables) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    def info(self, variables=None) -> str:
        n = self.num_params(variables) if variables else -1
        return f"ClassificationModel(nc={self.nc}, params={n:,})"


class _ClsNet(nn.Module):
    backbone: Any
    head: Any

    def __call__(self, x, train: bool = False):
        return self.head(self.backbone(x, train), train)


class ClassificationDataset:
    """ImageFolder layout: root/<split>/<class_name>/img.jpg."""

    def __init__(self, root: str | Path, imgsz: int = 224):
        self.root = Path(root)
        self.imgsz = imgsz
        classes = sorted(p.name for p in self.root.iterdir() if p.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class directories under {self.root}")
        self.names = dict(enumerate(classes))
        self.samples: List[Tuple[str, int]] = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix.lstrip(".").lower() in IMG_FORMATS:
                    self.samples.append((str(f), ci))
        if not self.samples:
            raise FileNotFoundError(f"no images under {self.root}")

    def __len__(self):
        return len(self.samples)

    def get(self, i: int, rng: Optional[np.random.Generator] = None, augment: bool = False):
        path, label = self.samples[i]
        img = cv2.imread(path)
        img = cv2.resize(img, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        if augment and rng is not None and rng.random() < 0.5:
            img = np.ascontiguousarray(np.fliplr(img))
        return img[..., ::-1], label  # RGB


def train_classifier(
    model: ClassificationModel,
    data_root: str | Path,
    epochs: int = 10,
    batch: int = 64,
    imgsz: int = 224,
    lr0: float = 0.001,
    seed: int = 0,
) -> Dict[str, float]:
    """Minimal classification training loop: AdamW + cosine, CE loss,
    per-epoch top-1 validation. Returns final metrics."""
    import optax

    train_set = ClassificationDataset(Path(data_root) / "train", imgsz)
    val_dir = Path(data_root) / ("val" if (Path(data_root) / "val").exists() else "test")
    val_set = ClassificationDataset(val_dir, imgsz) if val_dir.exists() else None

    variables = model.init(jax.random.PRNGKey(seed))
    nb = max(len(train_set) // batch, 1)
    tx = optax.adamw(optax.cosine_decay_schedule(lr0, epochs * nb), weight_decay=5e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, labels):
        def loss_fn(p):
            logits, upd = model.apply({"params": p, "batch_stats": batch_stats}, imgs, True, mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            return loss, (upd["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == labels).mean()
        return params, new_stats, opt_state, loss, acc

    params, batch_stats = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(seed)
    metrics: Dict[str, float] = {}
    for epoch in range(epochs):
        idxs = rng.permutation(len(train_set))
        losses, accs = [], []
        t0 = time.time()
        for b in range(nb):
            sel = idxs[b * batch : (b + 1) * batch]
            if len(sel) < batch:
                sel = np.concatenate([sel, idxs[: batch - len(sel)]])
            ims, labs = zip(*(train_set.get(int(i), rng, augment=True) for i in sel))
            imgs = jnp.asarray(np.stack(ims)).astype(jnp.float32) / 255.0
            labels = jnp.asarray(labs)
            params, batch_stats, opt_state, loss, acc = step(params, batch_stats, opt_state, imgs, labels)
            losses.append(float(loss))
            accs.append(float(acc))
        msg = f"epoch {epoch + 1}/{epochs}  loss {np.mean(losses):.4f}  acc {np.mean(accs):.3f}"
        if val_set is not None:
            metrics = validate_classifier(model, {"params": params, "batch_stats": batch_stats}, val_set, batch)
            msg += f"  top1 {metrics['top1']:.3f}"
        LOGGER.info(msg + f"  ({len(train_set) / (time.time() - t0):.1f} img/s)")
    model.variables = {"params": params, "batch_stats": batch_stats}
    metrics["train_acc"] = float(np.mean(accs))
    return metrics


def validate_classifier(model, variables, dataset: ClassificationDataset, batch: int = 64) -> Dict[str, float]:
    """Top-1/top-5 accuracy."""
    infer = jax.jit(lambda v, x: model.predict(v, x))
    correct1 = correct5 = 0
    for start in range(0, len(dataset), batch):
        items = [dataset.get(i) for i in range(start, min(start + batch, len(dataset)))]
        ims, labs = zip(*items)
        pad = batch - len(ims)
        imgs = np.stack(list(ims) + [ims[0]] * pad)
        probs = np.asarray(infer(variables, jnp.asarray(imgs).astype(jnp.float32) / 255.0))[: len(labs)]
        top5 = np.argsort(-probs, -1)[:, :5]
        labs = np.asarray(labs)
        correct1 += int((top5[:, 0] == labs).sum())
        correct5 += int((top5 == labs[:, None]).any(-1).sum())
    n = len(dataset)
    return {"top1": correct1 / n, "top5": correct5 / n}
