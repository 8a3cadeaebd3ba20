"""Wall-clock timing + profiling hooks.

ExecutionTime mirrors train_base/utils.py:53-65; `trace` wraps
jax.profiler for on-demand TPU traces (the reference had no profiler at all,
SURVEY.md §5 -- this is the TPU-native upgrade).
"""
from __future__ import annotations

import contextlib
import time


class ExecutionTime:
    def __init__(self):
        self.start_time = time.time()

    def duration(self) -> int:
        return int(time.time() - self.start_time)

    def seconds(self) -> float:
        return time.time() - self.start_time


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(metrics: dict, key: str = "step_seconds"):
    t0 = time.perf_counter()
    yield
    metrics[key] = time.perf_counter() - t0
