"""Minimal host data loader: sampler → dataset → collate, with a background
thread pool for prefetch (replaces torch DataLoader worker processes,
ttts/gpt/train.py num_workers=32)."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Optional, Sequence


class DataLoader:
    def __init__(self, dataset, batch_sampler: Iterable[List[int]],
                 collate_fn: Callable, num_workers: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate = collate_fn
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __iter__(self) -> Iterator:
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def produce():
            try:
                for idxs in self.batch_sampler:
                    examples = list(pool.map(self.dataset.__getitem__, idxs))
                    q.put(self.collate(examples))
            finally:
                q.put(DONE)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield item
        pool.shutdown(wait=False)

    def __len__(self):
        try:
            return len(self.batch_sampler)  # type: ignore[arg-type]
        except TypeError:
            return 0


class EpochLoader:
    """Re-iterates a DistributedBucketSampler-backed loader with a new epoch
    seed each pass (vqvae/train.py epoch loop semantics)."""

    def __init__(self, make_loader: Callable[[int], DataLoader]):
        self.make_loader = make_loader
        self.epoch = 0

    def __iter__(self):
        while True:
            loader = self.make_loader(self.epoch)
            yield from loader
            self.epoch += 1
