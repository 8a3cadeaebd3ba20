"""Prefetching loader: ordering, re-iteration, error propagation."""
import time

import numpy as np
import jax.numpy as jnp
import pytest

from cruse_tpu.data.prefetch import prefetch, PrefetchingLoader


def test_order_preserved():
    batches = [{"x": jnp.full((2,), i)} for i in range(10)]
    out = list(prefetch(iter(batches), size=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert int(b["x"][0]) == i


def test_reiterable_loader():
    def make():
        return iter([{"x": jnp.ones(2) * i} for i in range(4)])

    loader = PrefetchingLoader(make, size=2)
    assert len(list(loader())) == 4
    assert len(list(loader())) == 4  # fresh producer per epoch


def test_error_propagates():
    def gen():
        yield {"x": jnp.zeros(1)}
        raise ValueError("producer boom")

    it = prefetch(gen(), size=2)
    next(it)
    with pytest.raises(ValueError, match="producer boom"):
        next(it)


def test_overlap_actually_happens():
    """Producer runs ahead while the consumer is slow."""
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield {"x": np.zeros(1)}

    it = prefetch(gen(), size=4, device_put=False)
    next(it)  # consume one
    deadline = time.time() + 5.0
    while len(produced) < 4 and time.time() < deadline:
        time.sleep(0.02)
    assert len(produced) >= 4  # ran ahead of consumption
    assert len(list(it)) == 4


def test_early_abandonment_stops_producer():
    import threading

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.zeros(1)}

    before = threading.active_count()
    it = prefetch(gen(), size=2, device_put=False)
    next(it)
    it.close()  # abandon early -- must release the producer thread
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before
    assert len(produced) < 1000  # producer did not run to completion
