"""Minimal batched data loader with background prefetch.

Replaces torch DataLoader for this framework: indexes are shuffled with
a seeded NumPy generator, batches are collated to bucketed NumPy arrays,
and either a thread pipeline or a process pool overlaps host-side
feature extraction with device steps (the torch ``num_workers``
analogue, reference voice100/data_modules.py:628-666; a native C++
decode path plugs in underneath via dsp.audioio).

``num_workers=0`` (default) reads and collates on a background thread —
enough when the cache is warm and the step is device-bound.
``num_workers>0`` moves per-batch read+collate into spawned worker
processes, bypassing the GIL for multi-core hosts; batch ORDER AND
CONTENT are identical to the thread path (tests/test_data.py pins
byte-identical epochs).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

__all__ = ["DataLoader"]


# -- process-pool worker plumbing (module-level so "spawn" can pickle) --
_WORKER_STATE: Optional[tuple] = None


def _worker_init(dataset, collate_fn, pad_to_full, batch_size) -> None:
    global _WORKER_STATE
    # a cache-miss in a worker runs feature extraction; force it onto
    # the host CPU so workers never contend for the parent's TPU
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _WORKER_STATE = (dataset, collate_fn, pad_to_full, batch_size)


def _worker_collate(idx):
    dataset, collate_fn, pad_to_full, batch_size = _WORKER_STATE
    batch_prefetch = getattr(dataset, "prefetch", None)
    if callable(batch_prefetch):
        batch_prefetch(idx)
    items = [dataset[int(i)] for i in idx]
    n_real = len(items)
    if pad_to_full and len(items) < batch_size:
        reps = -(-batch_size // len(items))
        items = (items * reps)[:batch_size]
    return collate_fn(items), n_real


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
        num_workers: int = 0,
        length_hint: Optional[Callable[[int], Optional[int]]] = None,
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
        # multi-host DP: every process computes the same shuffled
        # epoch (same seed) as GLOBAL batches of
        # batch_size*process_count and reads its contiguous row slice
        # of each — see _epoch_index_chunks
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = num_workers
        # length-bucketed batch formation: ``length_hint(idx)`` returns
        # an item's feature frame count cheaply (or None when unknown).
        # When set, each epoch's shuffled items are grouped by their
        # collate TIME bucket and batches form within groups, so a
        # batch's padded extent tracks its own items instead of the
        # corpus max — with a uniform shuffle, one long clip drags
        # every batch it lands in up to the top bucket (the reference
        # pays this too: pad-to-batch-max collate over a uniform
        # sampler, voice100/data_modules.py:446-455). Epoch content is
        # the same multiset of items; bucket-group order and
        # within-group items reshuffle each epoch, so training does
        # not sweep lengths monotonically.
        self.length_hint = length_hint
        self._executor = None
        self._epoch = 0

    # ------------------------------------------------------------------
    def _get_executor(self):
        """Lazily start (and keep across epochs — spawn startup is
        seconds per worker) the collate process pool."""
        if self._executor is None:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            self._executor = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_worker_init,
                initargs=(self.dataset, self.collate_fn,
                          self.pad_to_full, self.batch_size),
            )
        return self._executor

    def close(self) -> None:
        if self._executor is not None:
            self._executor.shutdown(wait=False, cancel_futures=True)
            self._executor = None

    def __del__(self) -> None:
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        # every process emits one local batch per GLOBAL batch, so the
        # epoch length is identical on all processes (a divergent count
        # would deadlock the collectives of a multi-process step)
        gbs = self.batch_size * self.process_count
        if self.drop_last:
            return n // gbs
        return -(-n // gbs)

    def _epoch_index_chunks(self):
        order = np.arange(len(self.dataset))
        rng = None
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.process_count <= 1:
            if self.length_hint is not None:
                chunks = self._bucketed_chunks(order, rng,
                                               self.batch_size)
                if chunks is not None:
                    return chunks
            return self._plain_chunks(order, self.batch_size)
        # multi-process DP: form GLOBAL batches of
        # batch_size*process_count — every process computes the same
        # chunks from the same seed — then take this process's
        # CONTIGUOUS row slice of each. The process-concatenated global
        # batch then preserves single-process row order exactly, so a
        # pod trajectory is RNG-identical (augmentation/dropout keys
        # and all) to a single-process run at the global batch size.
        # The final partial global batch instead strides its rows
        # across processes (shards stay disjoint, chunk counts stay
        # equal) and each process self-pads via pad_to_full.
        gbs = self.batch_size * self.process_count
        gchunks = None
        if self.length_hint is not None:
            gchunks = self._bucketed_chunks(order, rng, gbs)
        if gchunks is None:
            gchunks = self._plain_chunks(order, gbs)
        p, pc, bs = self.process_index, self.process_count, self.batch_size
        out = []
        for chunk in gchunks:
            if len(chunk) == gbs:
                out.append(chunk[p * bs:(p + 1) * bs])
            else:
                rows = chunk[p::pc]
                if len(rows) == 0:
                    # fewer tail rows than processes: repeat a row so
                    # every process still emits the same batch count
                    # (the duplicate carries normal loss weight)
                    rows = chunk[p % len(chunk): p % len(chunk) + 1]
                out.append(rows)
        return out

    def _plain_chunks(self, order, batch_size):
        n = len(order)
        stop = n - n % batch_size if self.drop_last else n
        return [
            order[start:start + batch_size]
            for start in range(0, stop, batch_size)
        ]

    def _bucketed_chunks(self, order, rng, batch_size):
        """Group the epoch's items by collate time bucket and batch
        within groups; per-bucket remainders merge into cross-bucket
        tail batches, so the epoch's batch count is exactly the
        unbucketed ``ceil(n/batch_size)`` (or ``floor`` with
        ``drop_last``). Each epoch emits its buckets as CONTIGUOUS
        groups — group order and within-group items reshuffle per
        epoch, but batches of one bucket stay adjacent, which is what
        lets the trainer's scan dispatch run long per-bucket scans
        while preserving this exact batch order (device_cache.py
        epoch_plan's run-length grouping). Returns None when any
        item's length is unknown (cold feature cache) — that epoch
        batches unbucketed and the next, with the cache warm, buckets.
        """
        from .collate import bucket_extent

        groups = {}
        keys = []
        for i in order:
            n = self.length_hint(int(i))
            if n is None:
                return None
            b = bucket_extent("time", int(n))
            if b not in groups:
                groups[b] = []
                keys.append(b)
            groups[b].append(i)
        if rng is not None:
            keys = [keys[j] for j in rng.permutation(len(keys))]
        bs = batch_size
        chunks = []
        leftover = []
        for b in keys:
            idxs = np.asarray(groups[b])
            full = len(idxs) - len(idxs) % bs
            chunks.extend(
                idxs[s:s + bs] for s in range(0, full, bs)
            )
            leftover.extend(idxs[full:])
        leftover = np.asarray(leftover, dtype=order.dtype)
        stop = (
            len(leftover) - len(leftover) % bs
            if self.drop_last else len(leftover)
        )
        chunks.extend(
            leftover[s:s + bs] for s in range(0, stop, bs)
        )
        return chunks

    def _effective_indices(self, idx) -> np.ndarray:
        """Per-row dataset indices of a collated batch, including the
        pad-duplicate tail (mirrors the item padding in _batches)."""
        if self.pad_to_full and len(idx) < self.batch_size:
            reps = -(-self.batch_size // len(idx))
            return np.concatenate([idx] * reps)[: self.batch_size]
        return np.asarray(idx)

    def _batches(self, with_counts: bool = False,
                 with_indices: bool = False) -> Iterator:
        if self.num_workers > 0:
            yield from self._batches_pooled(with_counts, with_indices)
            return
        batch_prefetch = getattr(self.dataset, "prefetch", None)
        for idx in self._epoch_index_chunks():
            if callable(batch_prefetch):
                # native thread-pool decode of the batch's cache misses
                batch_prefetch(idx)
            items = [self.dataset[int(i)] for i in idx]
            n_real = len(items)
            if self.pad_to_full and len(items) < self.batch_size:
                reps = -(-self.batch_size // len(items))
                items = (items * reps)[: self.batch_size]
            batch = self.collate_fn(items)
            out = (batch, n_real) if with_counts else batch
            yield (self._effective_indices(idx), out) if (
                with_indices
            ) else out

    def _batches_pooled(self, with_counts: bool,
                        with_indices: bool = False) -> Iterator:
        """Read+collate in worker processes with a bounded in-flight
        window (ProcessPoolExecutor gives backpressure; Pool.imap would
        greedily queue the whole epoch's batches in memory)."""
        executor = self._get_executor()
        chunks = self._epoch_index_chunks()
        window = self.num_workers + max(self.prefetch, 1)
        from collections import deque

        pending: deque = deque()
        submitted = 0
        try:
            while submitted < len(chunks) and len(pending) < window:
                pending.append(
                    executor.submit(_worker_collate, chunks[submitted])
                )
                submitted += 1
            done = 0
            while pending:
                batch, n_real = pending.popleft().result()
                idx = chunks[done]
                done += 1
                if submitted < len(chunks):
                    pending.append(
                        executor.submit(_worker_collate, chunks[submitted])
                    )
                    submitted += 1
                out = (batch, n_real) if with_counts else batch
                yield (self._effective_indices(idx), out) if (
                    with_indices
                ) else out
        finally:
            for fut in pending:
                fut.cancel()

    def iter_with_counts(self) -> Iterator:
        """Yield ``(batch, n_real)`` where the first ``n_real`` rows are
        real samples and the rest are pad duplicates (evaluation uses
        this to keep metrics invariant to ``pad_to_full``)."""
        yield from self._batches(with_counts=True)

    def iter_with_indices(self) -> Iterator:
        """Yield ``(indices, batch)`` where ``indices[i]`` is the
        dataset index of batch row ``i`` (pad-duplicate rows repeat
        their source index). Feeds the HBM-resident feature cache
        (data/device_cache.py)."""
        yield from self._batches(with_indices=True)

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0 or self.num_workers > 0:
            # pooled mode overlaps via its in-flight future window; an
            # extra thread hop would only add queue copies
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
