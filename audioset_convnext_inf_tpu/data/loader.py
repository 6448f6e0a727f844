"""Asynchronous prefetching data loader.

The reference leans on torch ``DataLoader`` with 10 worker processes
(evaluate_convnext_on_audioset.py:71-85); h5py releases the GIL during
reads, so a thread pool gets the same IO overlap without pickling batches
across processes. Batches are assembled ahead of consumption in a bounded
queue, and :func:`device_prefetch` keeps one batch in flight on the device
so host IO overlaps device compute (double buffering).

Static-shape discipline: with ``pad_to_batch_size=True`` the final partial
eval batch is zero-padded to the full batch size and reported via
``batch["valid"]`` so a single jit-compiled program serves every step.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

import numpy as np

from audioset_convnext_inf_tpu.data.hdf5_dataset import AudioSetDataset, collate


class DataLoader:
    def __init__(
        self,
        dataset: AudioSetDataset,
        batch_sampler: Iterable,
        num_workers: int = 8,
        prefetch_batches: int = 4,
        collate_fn: Callable = collate,
        pad_to_batch_size: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.collate_fn = collate_fn
        self.pad_to_batch_size = pad_to_batch_size

    def _load_batch(self, batch_meta) -> dict:
        items = [self.dataset[meta] for meta in batch_meta]
        for item, meta in zip(items, batch_meta):
            if "target" in meta and "target" not in item:
                item["target"] = meta["target"]
        batch = self.collate_fn(items)
        n = len(items)
        if self.pad_to_batch_size and n < self.pad_to_batch_size:
            pad = self.pad_to_batch_size - n
            for k, v in batch.items():
                if isinstance(v, np.ndarray) and v.dtype != object and v.ndim >= 1:
                    widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
                    batch[k] = np.pad(v, widths)
                else:
                    batch[k] = np.concatenate([v, np.array([v[-1]] * pad, dtype=v.dtype)])
        batch["valid"] = n
        return batch

    def __iter__(self) -> Iterator[dict]:
        sentinel = object()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Put with periodic stop checks; True if delivered. An abandoned
            consumer stops draining, and an unconditional blocking put on the
            bounded queue would leak this thread + its pool + HDF5 handles."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # The producer runs the sampler AHEAD of consumption (prefetch),
            # so the sampler's live state_dict() does not correspond to the
            # last batch the trainer consumed. Snapshot the state right
            # after each draw and ship it with the batch: a checkpoint then
            # saves the snapshot of the last *consumed* batch, and resume
            # regenerates exactly the batches the restarted run never saw.
            can_snapshot = hasattr(self.batch_sampler, "state_dict")

            def finish(fut, state):
                batch = fut.result()
                if can_snapshot:
                    batch["sampler_state"] = state
                return batch

            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    pending = []
                    for batch_meta in self.batch_sampler:
                        if stop.is_set():
                            return
                        state = self.batch_sampler.state_dict() if can_snapshot else None
                        pending.append((pool.submit(self._load_batch, batch_meta), state))
                        # bounded in-flight window preserves batch order
                        while len(pending) >= self.num_workers:
                            if not put_or_stop(finish(*pending.pop(0))):
                                return
                    for fut_state in pending:
                        if not put_or_stop(finish(*fut_state)):
                            return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                if stop.is_set():  # consumer gone; don't block on a full queue
                    try:
                        q.put_nowait(sentinel)
                    except queue.Full:
                        pass
                else:
                    q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(iterator: Iterable, sharding=None, size: int = 2) -> Iterator:
    """Keep ``size`` batches in flight on-device (double buffering).

    ``sharding`` - optional jax.sharding.Sharding to place batches across a
    mesh; defaults to the default device. Non-array entries pass through.
    """
    import collections

    import jax
    import jax.numpy as jnp

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object and np.issubdtype(v.dtype, np.number):
                out[k] = jax.device_put(v, sharding) if sharding is not None else jnp.asarray(v)
            else:
                out[k] = v
        return out

    buf = collections.deque()
    it = iter(iterator)
    try:
        while True:
            while len(buf) < size:
                buf.append(to_device(next(it)))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()
