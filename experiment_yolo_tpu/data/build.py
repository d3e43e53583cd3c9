"""Batch iteration: threaded prefetching loader over YOLODataset.

Rebuild of the reference's ``ultralytics/data/build.py``
(InfiniteDataLoader + seed_worker + build_dataloader). Torch's
multi-process workers become a thread pool (numpy/cv2 release the GIL for
the heavy ops); batches are stacked numpy arrays ready for a single
host->device transfer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from experiment_yolo_tpu.data.dataset import YOLODataset


def _stack(samples) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DataLoader:
    """Epoch-based shuffling loader with background prefetch.

    Drops the last partial batch in training (static batch shapes for XLA);
    pads the last batch for validation.
    """

    def __init__(
        self,
        dataset: YOLODataset,
        batch_size: int,
        shuffle: bool = True,
        workers: int = 8,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 4,
        mosaic: Optional[bool] = None,
        rect: bool = False,
        stride: int = 32,
        shard_by_process: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        # multi-host: every process computes the same global index order
        # (same seed) and loads only its contiguous slice of each global
        # batch — the counterpart of the reference's DistributedSampler
        # (build.py:InfiniteDataLoader + distributed.py). The train step then
        # assembles the global array via mesh.shard_batch.
        self._pc, self._pi = 1, 0
        if shard_by_process:
            import jax

            self._pc, self._pi = jax.process_count(), jax.process_index()
            if batch_size % self._pc:
                raise ValueError(f"batch {batch_size} not divisible by {self._pc} processes")
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.mosaic = mosaic  # None = dataset default; False forces close_mosaic
        self.rect = rect and not shuffle  # rect batching is a val feature
        self.stride = stride
        self.epoch = 0
        if self.rect:
            # sort by aspect ratio; per-batch shape = imgsz scaled by the
            # batch's extreme aspect, stride-rounded (reference
            # data/base.py:set_rectangle). Distinct shapes are few, so XLA
            # compiles a bounded set of programs.
            shapes = dataset.image_shapes().astype(np.float64)
            ar = shapes[:, 0] / shapes[:, 1]  # h / w
            self._rect_order = np.argsort(ar)
            nb = (len(dataset) + batch_size - 1) // batch_size
            self._batch_shapes = []
            s = dataset.imgsz
            for b in range(nb):
                ari = ar[self._rect_order[b * batch_size : (b + 1) * batch_size]]
                mini, maxi = ari.min(), ari.max()
                hw = [1.0, 1.0]
                if maxi < 1:
                    hw = [maxi, 1.0]
                elif mini > 1:
                    hw = [1.0, 1.0 / mini]
                shape = (
                    int(np.ceil(hw[0] * s / self.stride) * self.stride),
                    int(np.ceil(hw[1] * s / self.stride) * self.stride),
                )
                self._batch_shapes.append(shape)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def image_order(self) -> np.ndarray:
        """Dataset indices in iteration order (valid for shuffle=False)."""
        return self._rect_order.copy() if self.rect else np.arange(len(self.dataset))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        idxs = self._rect_order.copy() if self.rect else np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(idxs)
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    batch_idx = idxs[b * self.batch_size : (b + 1) * self.batch_size]
                    if len(batch_idx) < self.batch_size and not self.drop_last:
                        pad = np.zeros(self.batch_size - len(batch_idx), batch_idx.dtype)
                        batch_idx = np.concatenate([batch_idx, pad])  # pad with index 0
                    if self._pc > 1:  # this host's slice of the global batch
                        lbs = self.batch_size // self._pc
                        batch_idx = batch_idx[self._pi * lbs : (self._pi + 1) * lbs]
                    seeds = [self.seed * 1_000_003 + self.epoch * 10_007 + int(i) for i in batch_idx]
                    if self.shuffle:
                        samples = list(
                            pool.map(
                                lambda a: self.dataset.get_sample(a[0], np.random.default_rng(a[1]), mosaic=self.mosaic),
                                zip(batch_idx.tolist(), seeds),
                            )
                        )
                    else:
                        shape = self._batch_shapes[b] if self.rect else None
                        samples = list(
                            pool.map(lambda i: self.dataset.get_val_sample(i, shape=shape), batch_idx.tolist())
                        )
                    q.put(_stack(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def build_yolo_dataset(cfg, img_path, mode: str = "train", data: dict | None = None) -> YOLODataset:
    """Dataset factory (reference data/build.py:85). ``data`` is the resolved
    dataset-yaml dict (supplies kpt_shape/flip_idx for pose)."""
    return YOLODataset(
        img_path=img_path,
        imgsz=cfg.imgsz,
        augment=mode == "train",
        hyp=cfg,
        max_labels=getattr(cfg, "max_labels", 128),
        fraction=getattr(cfg, "fraction", 1.0) if mode == "train" else 1.0,
        single_cls=getattr(cfg, "single_cls", False),
        task=getattr(cfg, "task", "detect") or "detect",
        kpt_shape=(data or {}).get("kpt_shape", (17, 3)),
        flip_idx=(data or {}).get("flip_idx"),
        cache=getattr(cfg, "cache", False),
    )


def build_dataloader(dataset, batch_size, workers=8, shuffle=True, seed=0, drop_last=True,
                     shard_by_process=False) -> DataLoader:
    return DataLoader(dataset, batch_size, shuffle=shuffle, workers=workers, seed=seed,
                      drop_last=drop_last, shard_by_process=shard_by_process)
