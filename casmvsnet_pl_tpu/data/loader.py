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
                 pad_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        # fixed shapes for XLA: always drop ragged final batch when shuffling
        self.drop_last = drop_last if drop_last is not None else shuffle
        # pad_last: keep fixed shapes AND cover every sample — the ragged
        # final batch is padded to batch_size by repeating real samples with
        # their visibility masks zeroed, so the padded rows contribute
        # nothing to the mask-gated loss/metric sums (the reference's val
        # loop evaluates every sample, /root/reference/train.py:92-97).
        self.pad_last = pad_last and not self.drop_last
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
                batch = collate(list(pending.popleft()))
                n_real = min(self.batch_size,
                             len(self.dataset) - bi * self.batch_size)
                if self.pad_last and n_real < self.batch_size:
                    batch = pad_batch(batch, self.batch_size, n_real)
                yield batch


def pad_batch(batch: dict, batch_size: int, n_real: int) -> dict:
    """Pad a ragged batch to ``batch_size`` rows with mask-zeroed repeats.

    Every array is padded along axis 0 by repeating its last real row; the
    ``masks`` pyramid is zeroed on padded rows so they are invisible to the
    mask-gated loss and pixel-weighted metric sums.
    """
    pad = batch_size - n_real

    def pad_arr(x):
        if isinstance(x, list):
            return x + [x[-1]] * pad
        reps = np.repeat(x[-1:], pad, axis=0)
        return np.concatenate([x, reps], axis=0)

    out = {}
    for key, val in batch.items():
        if isinstance(val, dict):
            out[key] = {k: pad_arr(v) for k, v in val.items()}
        else:
            out[key] = pad_arr(val)
    if "masks" in out:
        for k, v in out["masks"].items():
            v = v.copy()
            v[n_real:] = 0
            out["masks"][k] = v
    return out


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
