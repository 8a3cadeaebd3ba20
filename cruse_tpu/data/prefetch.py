"""Background-thread batch prefetching (host/device overlap).

The reference relied on torch DataLoader worker processes; here a daemon
thread runs the host-side batch assembly (file IO, concat, crop -- the numpy
part of SynMixDataset) and eagerly device_puts results into a bounded queue
while the chip trains on the previous batch. The device-side mixing stays in
the consumer's jitted step.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax


class _Sentinel:
    pass


_DONE = _Sentinel()


def prefetch(batches: Iterable, size: int = 2, device_put: bool = True) -> Iterator:
    """Wrap a batch iterable with a producer thread + bounded queue.

    Exceptions in the producer propagate to the consumer. `device_put=True`
    transfers array leaves to the default device inside the producer thread,
    so transfer overlaps compute.
    """
    q: "queue.Queue[Any]" = queue.Queue(maxsize=size)

    def put(batch):
        if not device_put:
            return batch
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if hasattr(x, "shape") else x, batch
        )

    def producer():
        try:
            for batch in batches:
                q.put(put(batch))
        except BaseException as e:  # surface errors on the consumer side
            q.put(e)
            return
        q.put(_DONE)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if isinstance(item, _Sentinel):
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class PrefetchingLoader:
    """Re-iterable wrapper: each epoch gets a fresh producer thread."""

    def __init__(self, make_batches, size: int = 2):
        self.make_batches = make_batches
        self.size = size

    def __call__(self):
        return prefetch(self.make_batches(), self.size)

    def __iter__(self):
        return self()
