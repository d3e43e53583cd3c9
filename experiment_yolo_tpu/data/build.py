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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.mosaic = mosaic  # None = dataset default; False forces close_mosaic
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        idxs = np.arange(len(self.dataset))
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
                    seeds = [self.seed * 1_000_003 + self.epoch * 10_007 + int(i) for i in batch_idx]
                    if self.shuffle:
                        samples = list(
                            pool.map(
                                lambda a: self.dataset.get_sample(a[0], np.random.default_rng(a[1]), mosaic=self.mosaic),
                                zip(batch_idx.tolist(), seeds),
                            )
                        )
                    else:
                        samples = list(pool.map(self.dataset.get_val_sample, batch_idx.tolist()))
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


def build_yolo_dataset(cfg, img_path, mode: str = "train") -> YOLODataset:
    """Dataset factory (reference data/build.py:85)."""
    return YOLODataset(
        img_path=img_path,
        imgsz=cfg.imgsz,
        augment=mode == "train",
        hyp=cfg,
        max_labels=getattr(cfg, "max_labels", 128),
        fraction=getattr(cfg, "fraction", 1.0) if mode == "train" else 1.0,
        single_cls=getattr(cfg, "single_cls", False),
    )


def build_dataloader(dataset, batch_size, workers=8, shuffle=True, seed=0, drop_last=True) -> DataLoader:
    return DataLoader(dataset, batch_size, shuffle=shuffle, workers=workers, seed=seed, drop_last=drop_last)
