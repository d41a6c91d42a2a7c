"""Host-side batching, shuffling, prefetch and device transfer.

The TPU-native replacement for the reference's
``DataLoader(num_workers=4, pin_memory=True)`` (/root/reference/train.py:85-97):
a thread pool loads/decodes samples, batches are collated into fixed-shape
numpy dicts, and an async prefetcher overlaps host IO with device compute by
``jax.device_put``-ing the next batch (optionally with a NamedSharding so each
chip gets its slice of the batch directly).
"""
from __future__ import annotations

import collections
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import numpy as np


def collate(samples: list[dict]) -> dict:
    """Stack a list of sample dicts into a batch dict (numpy)."""
    batch: dict[str, Any] = {}
    first = samples[0]
    for key in first:
        if key == "scan_vid":
            batch[key] = [s[key] for s in samples]
        elif isinstance(first[key], dict):
            batch[key] = {k: np.stack([s[key][k] for s in samples])
                          for k in first[key]}
        else:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples])
    return batch


class DataLoader:
    """Minimal epoch-based loader over a sequence-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool | None = None,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        # fixed shapes for XLA: always drop ragged final batch when shuffling
        self.drop_last = drop_last if drop_last is not None else shuffle
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        nb = len(self)
        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline two batches ahead
            pending = collections.deque()

            def submit(bi):
                idxs = order[bi * self.batch_size:(bi + 1) * self.batch_size]
                pending.append(pool.map(self.dataset.__getitem__, idxs))

            ahead = min(2, nb)
            for bi in range(ahead):
                submit(bi)
            for bi in range(nb):
                if bi + ahead < nb:
                    submit(bi + ahead)
                yield collate(list(pending.popleft()))


def prefetch_to_device(iterator: Iterator[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Overlap host loading with device compute.

    Moves batches onto device (with an optional ``jax.sharding.Sharding`` for
    the leading batch axis) from a background thread, keeping up to ``size``
    batches in flight.
    """
    import jax

    queue: collections.deque = collections.deque()
    sem = threading.Semaphore(size)
    done = object()

    def put(batch):
        host = {k: v for k, v in batch.items() if k != "scan_vid"}
        if sharding is not None:
            dev = jax.tree.map(
                lambda x: jax.device_put(x, sharding), host)
        else:
            dev = jax.tree.map(jax.device_put, host)
        if "scan_vid" in batch:
            dev["scan_vid"] = batch["scan_vid"]
        return dev

    stop = threading.Event()

    def worker():
        for batch in iterator:
            # poll so the worker can exit if the consumer abandons the
            # generator mid-epoch (else it would block forever holding up
            # to `size` device batches)
            while not sem.acquire(timeout=0.1):
                if stop.is_set():
                    return
            if stop.is_set():
                return
            queue.append(put(batch))
        queue.append(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            while not queue:
                t.join(timeout=0.005)
                if not t.is_alive() and not queue:
                    return
            item = queue.popleft()
            if item is done:
                return
            sem.release()
            yield item
    finally:
        stop.set()
        sem.release()  # unblock a worker parked on acquire
        t.join(timeout=5.0)
