"""Background-thread batch prefetching (producer/consumer overlap).

A daemon thread runs the batch-producing iterable -- for `SynMixDataset`
that includes the host-side file IO/crop AND the jitted on-device mixing, so
the consumer's train step overlaps with the next batch's assembly+mixing.
`device_put=True` additionally transfers numpy leaves inside the producer
(useful for plain-numpy iterables; `SynMixDataset` already yields device
arrays, for which it is a no-op).

The consumer may abandon the iterator early (e.g. the trainer stops at
steps_per_epoch): closing the generator signals the producer to stop, so no
thread or queue slot outlives the epoch.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

import jax


class _Sentinel:
    pass


_DONE = _Sentinel()


def prefetch(batches: Iterable, size: int = 2, device_put: bool = True) -> Iterator:
    """Wrap a batch iterable with a producer thread + bounded queue.

    Exceptions in the producer propagate to the consumer. Early consumer
    exit (break / generator close) stops the producer promptly.
    """
    q: "queue.Queue[Any]" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put(batch):
        if not device_put:
            return batch
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x) if hasattr(x, "shape") else x, batch
        )

    def producer():
        try:
            for batch in batches:
                item = put(batch)
                # bounded put that re-checks the stop flag instead of
                # blocking forever on an abandoned queue
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface errors on the consumer side
            while not stop.is_set():
                try:
                    q.put(e, timeout=0.1)
                    return
                except queue.Full:
                    continue
            return
        while not stop.is_set():
            try:
                q.put(_DONE, timeout=0.1)
                return
            except queue.Full:
                continue

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    try:
        while True:
            item = q.get()
            if isinstance(item, _Sentinel):
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer done (normally or abandoned): release the producer
        stop.set()
        while True:  # drain so a blocked put wakes immediately
            try:
                q.get_nowait()
            except queue.Empty:
                break


class PrefetchingLoader:
    """Re-iterable wrapper: each epoch gets a fresh producer thread.

    If the factory takes an ``epoch`` kwarg, the Trainer's per-epoch call
    forwards it (curriculum schedules); plain factories are untouched.
    """

    def __init__(self, make_batches, size: int = 2):
        import inspect

        self.make_batches = make_batches
        self.size = size
        try:
            self._wants_epoch = "epoch" in inspect.signature(make_batches).parameters
        except (TypeError, ValueError):
            self._wants_epoch = False

    def __call__(self, epoch: int | None = None):
        if epoch is not None and self._wants_epoch:
            return prefetch(self.make_batches(epoch=epoch), self.size)
        return prefetch(self.make_batches(), self.size)

    def __iter__(self):
        return self()
