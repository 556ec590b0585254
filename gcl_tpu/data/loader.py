"""Minimal multiprocess data loader + fixed-shape collation.

Replaces torch's DataLoader (the only host parallelism in the reference,
lib/colocation_data_loader.py:748-755) with a dependency-free
process-pool prefetcher: workers run `dataset[i]` (numpy in, numpy out),
the main process collates dicts by stacking along a new batch axis.
"""
from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


def collate_stack(samples: List[Dict]) -> Dict:
    """Stack each array field along a new leading axis; 'meta' fields are
    collected into lists."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) \
                or isinstance(vals[0], np.generic):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals
    return out


class DataLoader:
    """Iterable over collated batches with optional worker processes.

    num_workers=0 runs in-process (deterministic, used by tests); with
    workers, indices are dispatched round-robin and batches are assembled
    in order.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 drop_last=False, collate_fn=collate_stack, seed=0,
                 shard_id=0, num_shards=1):
        """shard_id/num_shards: multi-host input sharding. Every host
        enumerates the SAME global shuffled order (seed+epoch keyed, no
        cross-host communication) and keeps its contiguous slice of each
        global batch, so host h feeds batch_size/num_shards samples that
        together form the jit-global batch."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        if num_shards > 1 and batch_size % num_shards:
            raise ValueError(
                f"batch_size {batch_size} not divisible by "
                f"{num_shards} input shards")
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        batches = []
        per = self.batch_size // self.num_shards
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            if self.num_shards > 1:
                idx = idx[self.shard_id * per:(self.shard_id + 1) * per]
                if len(idx) == 0:
                    continue
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        if self.num_workers <= 0:
            for idx in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in idx])
            return
        yield from self._iter_workers(batches)

    def _iter_workers(self, batches):
        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        result_q = ctx.Queue(maxsize=2 * self.num_workers)

        def worker():
            while True:
                item = task_q.get()
                if item is None:
                    return
                bi, idx = item
                try:
                    samples = [self.dataset[int(i)] for i in idx]
                    result_q.put((bi, self.collate_fn(samples), None))
                except Exception as e:  # surface worker errors
                    result_q.put((bi, None, repr(e)))

        procs = [ctx.Process(target=worker, daemon=True)
                 for _ in range(self.num_workers)]
        for p in procs:
            p.start()
        for bi, idx in enumerate(batches):
            task_q.put((bi, idx))
        for _ in procs:
            task_q.put(None)

        pending = {}
        next_bi = 0
        try:
            for _ in range(len(batches)):
                while next_bi not in pending:
                    bi, batch, err = result_q.get()
                    if err is not None:
                        raise RuntimeError(f"data worker failed: {err}")
                    pending[bi] = batch
                yield pending.pop(next_bi)
                next_bi += 1
        finally:
            for p in procs:
                p.terminate()
