"""Host prefetch loader with background batch assembly.

Role of ref `train_utils.py:21-23` (DataLoaderX = DataLoader +
BackgroundGenerator, pin_memory + non_blocking H2D): a worker thread
assembles the next uint8 host batches while the device trains on the current
one; `jax.device_put` overlaps the copy. Device-side augmentation
(transforms.augment_batch) then runs fused in the train step's program.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from .dataset import ReIDDataset
from .sampler import pk_epoch_indices


class PrefetchLoader:
    """Iterate batches of a ReIDDataset with background prefetch."""

    def __init__(self, dataset: ReIDDataset, batch_size: int,
                 indices: np.ndarray, drop_last: bool = False,
                 prefetch: int = 2, device_put: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = indices
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.device_put = device_put

    def __len__(self):
        n = len(self.indices)
        full = n // self.batch_size
        return full if (self.drop_last or n % self.batch_size == 0) else full + 1

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                n = len(self.indices)
                for s in range(0, n, self.batch_size):
                    chunk = self.indices[s:s + self.batch_size]
                    if len(chunk) < self.batch_size:
                        if self.drop_last:
                            break
                        # pad by wrapping (static batch shapes for jit)
                        extra = self.indices[: self.batch_size - len(chunk)]
                        chunk = np.concatenate([chunk, extra])
                    q.put(self.dataset.gather(chunk))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if self.device_put:
                item = jax.tree_util.tree_map(jax.device_put, item)
            yield item


def make_train_loader(dataset: ReIDDataset, batch_size: int,
                      num_instances: int, seed: int = 0,
                      epoch: int = 0,
                      device_put: bool = True) -> PrefetchLoader:
    """PK-sampled epoch loader (ref RandomIdentitySampler_ when --instance>0,
    plain shuffle otherwise — image_reid_train.py:51-58). Pass
    device_put=False when the consumer places batches itself (e.g. sharded
    over a mesh via parallel.place_batch)."""
    rng = np.random.default_rng(seed + epoch)
    if num_instances > 0:
        idx = pk_epoch_indices(dataset.labels, batch_size, num_instances, rng)
    else:
        idx = rng.permutation(len(dataset))
    return PrefetchLoader(dataset, batch_size, idx, drop_last=False,
                          device_put=device_put)


def make_eval_loader(dataset: ReIDDataset, batch_size: int) -> PrefetchLoader:
    return PrefetchLoader(dataset, batch_size,
                          np.arange(len(dataset)), drop_last=False)
