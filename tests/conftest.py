"""Test harness config: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are validated on host-platform virtual devices
(the driver separately dry-runs `__graft_entry__.dryrun_multichip`).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env pins the real TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + float32 matmuls on CPU for golden parity tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize force-registers the TPU platform and sets
# jax_platforms="axon,cpu"; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# This host has ONE cpu core, so XLA compilation dominates the suite's wall
# time. Persist compiled executables across runs: the second `pytest tests/`
# only recompiles programs whose graphs actually changed.
# (CRUSE_TPU_TEST_CACHE=0 disables; the loader may warn about machine-
# feature strings on AOT entries -- benign across hundreds of green runs
# on this host, but the kill switch exists.)
_cache_dir = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
try:
    if _cache_dir == "0":
        raise RuntimeError("cache disabled")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass  # cache is an optimization, never a requirement

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
