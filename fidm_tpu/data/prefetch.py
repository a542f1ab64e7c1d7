"""Host->device prefetching for TPU feeding.

Overlaps host-side batch assembly (PIL decode, mask rasterization) with
device compute by staging the next batch's transfer while the current step
runs — the TPU-native replacement for torch DataLoader worker processes
(`data/dataset.py:336-352`).
"""
from __future__ import annotations

import collections
import threading
from typing import Callable, Iterable, Iterator

import jax

__all__ = ["device_prefetch", "ThreadedLoader"]


def device_prefetch(iterator: Iterable, size: int = 2, sharding=None) -> Iterator:
    """Yield device-resident batches, keeping `size` transfers in flight.

    Array-valued dict entries are device_put (optionally with a NamedSharding
    so the batch lands pre-sharded over the mesh); other entries pass through.
    """
    queue = collections.deque()

    def put(batch):
        out = {}
        for k, v in batch.items():
            if hasattr(v, "shape"):
                out[k] = jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
            else:
                out[k] = v
        return out

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


class ThreadedLoader:
    """Run a (CPU-bound PIL/numpy) loader iterator in a background thread."""

    def __init__(self, make_iterator: Callable[[], Iterable], queue_size: int = 4):
        self._make = make_iterator
        self._qsize = queue_size

    def __iter__(self):
        import queue as q

        buf: "q.Queue" = q.Queue(maxsize=self._qsize)
        END = object()
        stop = threading.Event()
        err: list = []

        def _put(item) -> bool:
            # bounded-queue put that gives up when the consumer is gone —
            # an abandoned iteration (break / one-batch peek) must not pin
            # a blocked thread plus queued batches forever
            while not stop.is_set():
                try:
                    buf.put(item, timeout=0.5)
                    return True
                except q.Full:
                    continue
            return False

        def worker():
            try:
                for item in self._make():
                    if not _put(item):
                        return
            except BaseException as e:  # propagate, don't truncate the epoch
                err.append(e)
            finally:
                _put(END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = buf.get()
                if item is END:
                    break
                yield item
        finally:
            stop.set()
        if err:
            # a worker error silently truncating an epoch would train/eval
            # on partial data with no signal — re-raise in the consumer
            raise err[0]
