"""Multi-worker prefetching data loader (torch-free).

Replaces the torch `DataLoader` the reference leans on (data.py:484-503):
a thread pool decodes/transforms samples while the accelerator steps, with a
bounded prefetch queue of fully-collated numpy batches (double-buffered H2D
is handled by the train loop via `jax.device_put` on the next batch while the
current step runs asynchronously).

Threads (not processes) because PIL's decode/resize and numpy release the
GIL for the heavy parts; a C++ decode path is the planned upgrade for the
host-bound regime.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterable, List, Optional

import numpy as np

__all__ = ["DataLoader", "default_collate"]


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], (str, bytes)):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Iterate batches of collated numpy arrays with background workers.

    `sampler` yields indices (re-iterated each epoch; call `set_epoch` to
    reshuffle deterministically). With `sampler=None`, iterates sequentially.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[Iterable[int]] = None,
        num_workers: int = 4,
        drop_last: bool = True,
        collate_fn: Callable = default_collate,
        prefetch_batches: int = 4,
        length: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.prefetch_batches = prefetch_batches
        self.length = length  # override for iterable datasets of known size
        self.iterable = not hasattr(dataset, "__getitem__")

    def set_epoch(self, epoch: int):
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _batches(self) -> List[List[int]]:
        if self.sampler is not None:
            order = list(iter(self.sampler))
        else:
            order = list(range(len(self.dataset)))
        batches = [
            order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __len__(self):
        if self.length is not None:
            return self.length
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _iter_iterable(self):
        """Streaming path for iterable-only datasets (tar shards)."""
        buf = []
        for sample in self.dataset:
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield self.collate_fn(buf)
                buf = []
        if buf and not self.drop_last:
            yield self.collate_fn(buf)

    def __iter__(self):
        if self.iterable:
            # Same producer-thread + bounded-queue + stop/drain pattern as
            # the random-access path below, so streaming tar decode overlaps
            # the consumer's device compute instead of blocking __next__.
            q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
            stop = threading.Event()

            def producer():
                try:
                    for batch in self._iter_iterable():
                        while not stop.is_set():
                            try:
                                q.put(batch, timeout=0.2)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
                    q.put(None)
                except BaseException as e:  # noqa: BLE001 - re-raise in consumer
                    q.put(e)

            thread = threading.Thread(target=producer, daemon=True)
            thread.start()
            try:
                while True:
                    batch = q.get()
                    if batch is None:
                        break
                    if isinstance(batch, BaseException):
                        raise batch
                    yield batch
            finally:
                stop.set()
                while thread.is_alive():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        thread.join(timeout=0.05)
            return
        batches = self._batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def load_batch(idxs):
            return self.collate_fn([self.dataset[i] for i in idxs])

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                futures = []
                for idxs in batches:
                    if stop.is_set():
                        break
                    futures.append(pool.submit(load_batch, idxs))
                    # Backpressure: hand over completed batches in order.
                    while len(futures) >= self.num_workers:
                        q.put(futures.pop(0).result())
                        if stop.is_set():
                            return
                for f in futures:
                    if stop.is_set():
                        break
                    q.put(f.result())
            q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit.
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
