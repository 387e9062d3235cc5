"""Minimal batched data loader with background prefetch.

Replaces torch DataLoader for this framework: indexes are shuffled with
a seeded NumPy generator, batches are collated to bucketed NumPy arrays,
and a small thread pipeline overlaps host-side feature extraction with
device steps (the torch ``num_workers`` analogue; a native C++ decode
path plugs in underneath via dsp.audioio).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        prefetch: int = 2,
        pad_to_full: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Pad the final batch to the full batch size by repeating items:
        # keeps the leading axis static (one compiled program, clean DP
        # sharding) at the cost of a few duplicated samples per epoch.
        self.pad_to_full = pad_to_full
        # multi-host DP: each process reads its stride of the shuffled
        # order (same seed everywhere -> consistent epoch permutation)
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count if (
            self.process_count > 1
        ) else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self, with_counts: bool = False) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_count > 1:
            order = order[self.process_index::self.process_count]
        n = len(order)
        stop = n - n % self.batch_size if self.drop_last else n
        batch_prefetch = getattr(self.dataset, "prefetch", None)
        for start in range(0, stop, self.batch_size):
            idx = order[start:start + self.batch_size]
            if callable(batch_prefetch):
                # native thread-pool decode of the batch's cache misses
                batch_prefetch(idx)
            items = [self.dataset[int(i)] for i in idx]
            n_real = len(items)
            if self.pad_to_full and len(items) < self.batch_size:
                reps = -(-self.batch_size // len(items))
                items = (items * reps)[: self.batch_size]
            batch = self.collate_fn(items)
            yield (batch, n_real) if with_counts else batch

    def iter_with_counts(self) -> Iterator:
        """Yield ``(batch, n_real)`` where the first ``n_real`` rows are
        real samples and the rest are pad duplicates (evaluation uses
        this to keep metrics invariant to ``pad_to_full``)."""
        yield from self._batches(with_counts=True)

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that gives up when the consumer is gone, so an
            # abandoned iterator (graceful stop mid-epoch, an exception
            # in the train step) can't leave this thread blocked forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for batch in self._batches():
                    if not put(batch):
                        return
            except BaseException as e:  # propagate to consumer
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    break
                yield batch
            t.join()
        finally:
            stop.set()
            t.join(timeout=5.0)
        if error:
            raise error[0]
