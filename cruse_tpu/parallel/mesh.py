"""SPMD mesh + sharding rules.

Replaces the reference's gloo/DDP stack (tools/train_stand.py:28-34,
base_trainer.py:31, loss_func/distrib.py) with jax.sharding over a 2-D
device mesh:

- axis "data":  batch dimension (data parallelism; gradient psum rides ICI,
  the XLA-inserted equivalent of DDP's bucketed all-reduce)
- axis "model": grouped dimensions of the grouped-GRU / grouped-linear
  weights (tensor parallelism over the *group* axis -- groups are
  embarrassingly parallel in CRUSE-family models, so TP needs no extra
  collectives in the forward pass)

Parameter placement is rule-based on path + shape rather than hand-annotated
per layer.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. Defaults: all devices on "data"."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (n_data, n_model, n_total)
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over the data-parallel axes, replicate
    the rest. On a pod mesh (distributed.make_pod_mesh: ("dcn", "data",
    "model")) the batch shards over ("dcn", "data") jointly so cross-slice
    data parallelism actually parallelizes instead of silently replicating
    the batch per slice."""
    batch_axes = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    return NamedSharding(mesh, P(batch_axes, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, shape: tuple) -> P:
    """Sharding rule: grouped weights [G, ...] shard their group axis over
    "model" when divisible; everything else replicates."""
    leaf = path.split("/")[-1]
    grouped = leaf in ("w_ih", "w_hh", "b_ih", "b_hh", "weight") and len(shape) >= 2
    if grouped and len(shape) >= 2:
        return P("model", *([None] * (len(shape) - 1)))
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings for a param tree, by rule.

    Group axes only shard when they divide the "model" axis size; otherwise
    the param replicates (safe fallback).
    """
    n_model = mesh.shape["model"]

    def to_sharding(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _spec_for_param(path_str, leaf.shape)
        if spec != P() and leaf.shape[0] % n_model != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices owned by other processes
    (multi-host SPMD: placement must build global arrays, not device_put)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place one array with `sharding`, working in BOTH runtimes:

    - single-process (all mesh devices addressable): plain `jax.device_put`
    - multi-process: `jax.make_array_from_callback` -- each process
      materializes only its addressable shards of the global array, slicing
      them out of the (identical-on-every-process) host value `x`. This is
      the multi-host contract: every process must pass the same global
      value (deterministic data pipeline / identical init).
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    arr = np.asarray(jax.device_get(x))

    def shard(idx):
        s = np.asarray(arr[idx])
        # ascontiguousarray promotes 0-d to 1-d (ndim>=1 contract) -- keep
        # scalar shards 0-d, they are trivially contiguous
        return np.ascontiguousarray(s) if s.ndim else s

    return jax.make_array_from_callback(arr.shape, sharding, shard)


def put_tree(tree: Any, shardings: Any) -> Any:
    """put_global over a pytree; `shardings` is a matching pytree or one
    NamedSharding broadcast to every leaf."""
    if isinstance(shardings, NamedSharding):
        return jax.tree_util.tree_map(lambda x: put_global(x, shardings), tree)
    return jax.tree_util.tree_map(put_global, tree, shardings)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch with the leading dim sharded over "data"."""
    def put(x):
        return put_global(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def place_opt_state(mesh: Mesh, opt_state: Any, p_sh: Any) -> Any:
    """Device-put an optax state onto the mesh: param-shaped slots (Adam
    moments, MultiSteps accumulated grads) take their params' shardings,
    everything else replicates. Preserves optax's NamedTuple state types
    (a naive tuple() rebuild breaks optax.MultiSteps, whose update reads
    state.gradient_step)."""
    import optax

    rep = replicated(mesh)

    def is_typed(n):
        return isinstance(n, (optax.ScaleByAdamState, optax.MultiStepsState))

    def moment_sh(m):
        # flatten_optimizer collapses the moments to ONE flat vector --
        # param shardings no longer apply; replicate (documented trade-off
        # in StepConfig.flatten_optimizer)
        same = (jax.tree_util.tree_structure(m)
                == jax.tree_util.tree_structure(p_sh))
        return p_sh if same else rep

    def place(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=put_global(node.count, rep),
                mu=put_tree(node.mu, moment_sh(node.mu)),
                nu=put_tree(node.nu, moment_sh(node.nu)),
            )
        if isinstance(node, optax.MultiStepsState):
            return node._replace(
                mini_step=put_global(node.mini_step, rep),
                gradient_step=put_global(node.gradient_step, rep),
                inner_opt_state=place_opt_state(mesh, node.inner_opt_state, p_sh),
                acc_grads=put_tree(node.acc_grads, p_sh),
            )
        return jax.tree_util.tree_map(lambda x: put_global(x, rep), node)

    return jax.tree_util.tree_map(place, opt_state, is_leaf=is_typed)
