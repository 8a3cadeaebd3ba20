"""Opt-in persistent XLA compile cache for the CLIs.

First compiles through the tunneled runtime cost ~3 minutes; re-running a
CLI with unchanged graphs should not pay that again. Opt in with
CRUSE_TPU_COMPILE_CACHE=1 (same switch bench.py honors; tests/conftest.py
has its own always-on cache). Off by default so canonical runs stay
hermetic.
"""
from __future__ import annotations

import os


def maybe_enable_compile_cache() -> bool:
    """Enable the on-disk XLA compilation cache when
    CRUSE_TPU_COMPILE_CACHE=1. Returns True if enabled."""
    if os.environ.get("CRUSE_TPU_COMPILE_CACHE") != "1":
        return False
    try:
        import jax

        cache = os.environ.get("CRUSE_TPU_TEST_CACHE",
                               "/root/.cache/cruse_tpu_jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return True
    except Exception:
        return False  # cache is an optimization, never a requirement
