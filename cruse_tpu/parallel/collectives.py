"""Collective helpers: the loss_func/distrib.py surface, SPMD-native.

The reference hand-rolls async gloo collectives (rank/world_size, all_reduce,
broadcast_tensors with a param-count deadlock guard, sync_grad, sync_buffer,
average_metrics -- loss_func/distrib.py:13-134, with the all_reduce in
average_metrics left disabled). Under jit-SPMD most of these are implicit;
these helpers exist for explicit shard_map/pmap code paths and for API
parity.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def world_size() -> int:
    """Total participating devices (distrib.py:21-24)."""
    return jax.device_count()


def rank() -> int:
    """Process index (distrib.py:13-18); 0 on single-host."""
    return jax.process_index()


def is_distributed() -> bool:
    return jax.device_count() > 1


def tree_structures_match(tree_a: Any, tree_b: Any) -> bool:
    """Pytree-structure equality -- the SPMD analogue of the reference's
    param-count deadlock guard before collectives (distrib.py:40-54)."""
    return jax.tree_util.tree_structure(tree_a) == jax.tree_util.tree_structure(tree_b)


def all_reduce_mean(tree: Any, axis_name: str) -> Any:
    """pmean over a mapped axis (inside pmap/shard_map). Replaces
    sync_grad's async all-reduce + divide (distrib.py:100-116)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis_name), tree)


def all_reduce_sum(tree: Any, axis_name: str) -> Any:
    """psum over a mapped axis (distrib.py:31-33 equivalent)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), tree)


def broadcast_from_zero(tree: Any, axis_name: str) -> Any:
    """Make every shard see rank 0's values (broadcast_tensors,
    distrib.py:57-72): implemented as an all-gather + take(0)."""
    def bcast(x):
        gathered = jax.lax.all_gather(x, axis_name)
        return gathered[0]

    return jax.tree_util.tree_map(bcast, tree)


def replicate_to_devices(tree: Any) -> Any:
    """Host-side parameter replication across local devices
    (device_put_replicated; replaces the broadcast bootstrap)."""
    devices = jax.local_devices()
    return jax.device_put_replicated(tree, devices)


def average_metrics(metrics: Dict[str, jax.Array], axis_name: str, count: float = 1.0):
    """Cross-worker metric averaging with optional unnormalized weight
    (distrib.py:119-134 -- with the all_reduce actually enabled here)."""
    weight = jax.lax.psum(jnp.asarray(count, jnp.float32), axis_name)
    return {
        k: jax.lax.psum(jnp.asarray(v, jnp.float32) * count, axis_name) / weight
        for k, v in metrics.items()
    }
