"""Dataset explorer: embeddings, similarity search, and label queries.

Rebuild of the reference's ``ultralytics/data/explorer`` (Explorer +
ExplorerDataset): the reference embeds every image with the model and
stores them in a LanceDB table for similarity search and SQL filtering.
Here the embedding store is a plain numpy matrix (cosine similarity is one
matmul — MXU food), embeddings come from the model's own neck features via
the GraphModel ``capture`` taps, and queries are Python predicates over the
parsed labels instead of SQL strings.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from experiment_yolo_tpu.data.dataset import YOLODataset
from experiment_yolo_tpu.utils import LOGGER


def make_embed_fn(model):
    """Jitted (variables, uint8 NHWC imgs) -> (B, D) L2-normalized embeddings:
    global-average-pooled concat of the detect head's input feature maps,
    tapped via GraphModel ``capture`` (the reference's YOLO.embed taps,
    engine/model.py:357). Shared by Explorer and the YOLO.embed facade."""
    f = model.specs[model.detect_idx].f
    taps = tuple(j if j >= 0 else model.detect_idx - 1 for j in f)

    def embed(variables, imgs):
        imgs = imgs.astype(jnp.float32) / 255.0
        _, feats = model.module.apply(variables, imgs, False, capture=taps)
        pooled = jnp.concatenate([fm.mean(axis=(1, 2)) for fm in feats], -1)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)

    return jax.jit(embed)


class Explorer:
    """Embed a dataset with a detection model and query it.

    API surface mirrored from the reference Explorer (data/explorer/
    explorer.py): create_embeddings_table -> ``build``; get_similar ->
    ``similar``; sql_query -> ``query``; plot_similar -> caller-side.
    """

    def __init__(self, data_dir: str | Path, model, variables, imgsz: int = 256, batch: int = 8):
        self.dataset = YOLODataset(data_dir, imgsz=imgsz, augment=False)
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.batch = batch
        self.embeddings: Optional[np.ndarray] = None  # (N, D) L2-normalized

        self._embed = make_embed_fn(model)

    def build(self) -> np.ndarray:
        """Compute embeddings for every image (create_embeddings_table)."""
        out = []
        n = len(self.dataset)
        for s in range(0, n, self.batch):
            idxs = list(range(s, min(s + self.batch, n)))
            imgs = [self.dataset.get_val_sample(i)["img"] for i in idxs]
            while len(imgs) < self.batch:  # static batch pad
                imgs.append(np.zeros_like(imgs[0]))
            e = jax.device_get(self._embed(self.variables, jnp.asarray(np.stack(imgs))))
            out.append(e[: len(idxs)])
        self.embeddings = np.concatenate(out, 0)
        LOGGER.info(f"explorer: embedded {n} images ({self.embeddings.shape[1]}-d)")
        return self.embeddings

    def similar(self, idx: int, topk: int = 5) -> List[tuple]:
        """Most-similar images to dataset index ``idx`` (get_similar)."""
        assert self.embeddings is not None, "call build() first"
        sims = self.embeddings @ self.embeddings[idx]
        order = np.argsort(-sims)
        out = [(int(j), float(sims[j]), self.dataset.im_files[j]) for j in order if j != idx]
        return out[:topk]

    def similar_to_image(self, img: np.ndarray, topk: int = 5) -> List[tuple]:
        """Similarity search with an external query image (BGR uint8)."""
        assert self.embeddings is not None, "call build() first"
        import cv2

        from experiment_yolo_tpu.data.augment import letterbox

        q = letterbox(img, (self.imgsz, self.imgsz))[0][..., ::-1]  # BGR -> RGB
        batch = np.zeros((self.batch, self.imgsz, self.imgsz, 3), q.dtype)
        batch[0] = q
        e = jax.device_get(self._embed(self.variables, jnp.asarray(batch)))[0]
        sims = self.embeddings @ e
        order = np.argsort(-sims)[:topk]
        return [(int(j), float(sims[j]), self.dataset.im_files[j]) for j in order]

    def query(self, predicate: Callable[[dict], bool]) -> List[int]:
        """Label-predicate filtering (the reference's sql_query, minus the
        SQL string parser): predicate sees {'cls': (n,), 'bboxes_n': (n,4),
        'im_file': str} per image."""
        hits = []
        for i, (f, lab) in enumerate(zip(self.dataset.im_files, self.dataset.labels)):
            rec = {"cls": lab["cls"], "bboxes_n": lab["bboxes_n"], "im_file": f}
            if predicate(rec):
                hits.append(i)
        return hits

    def class_counts(self) -> dict:
        """Per-class instance counts across the dataset."""
        counts: dict = {}
        for lab in self.dataset.labels:
            for c in lab["cls"].astype(int):
                counts[int(c)] = counts.get(int(c), 0) + 1
        return counts
