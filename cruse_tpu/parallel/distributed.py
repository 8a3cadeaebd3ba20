"""Multi-host bootstrap + pod-scale hybrid meshes.

The reference's rendezvous is a hardcoded localhost gloo port
(tools/train_stand.py:28-34). The TPU-native equivalent:

- `initialize_distributed()` wraps `jax.distributed.initialize` with
  env-driven defaults (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID,
  auto-detected on Cloud TPU pods)
- `make_pod_mesh()` builds a hybrid mesh whose outermost axis spans hosts
  over DCN (data parallelism across slices) while the inner axes stay on
  ICI (data/model within a slice) -- so gradient psum rides ICI and only
  the cross-slice reduction touches DCN (the scaling-book recipe).

Single-host (this image) these degrade gracefully: initialize is a no-op
and the pod mesh falls back to the local mesh.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from cruse_tpu.utils.logger import log


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-process runtime; returns True if initialized.

    Args default from the environment (COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID); on Cloud TPU pods `jax.distributed.initialize()` with no
    args auto-discovers everything. Safe no-op on single-process setups.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0")) or None
    process_id = (
        process_id
        if process_id is not None
        else (int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None)
    )
    if coordinator_address is None and num_processes is None:
        # not a configured multi-process launch
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log(
            f"distributed runtime up: process {jax.process_index()}/{jax.process_count()},"
            f" {jax.device_count()} global devices"
        )
        return True
    except Exception as e:  # already initialized or single-process
        log(f"jax.distributed.initialize skipped: {e}")
        return False


def make_pod_mesh(ici_model: int = 1, devices=None) -> Mesh:
    """("dcn", "data", "model") mesh: hosts over DCN outermost, ICI within.

    Shard batches over ("dcn", "data") jointly and grouped weights over
    "model"; XLA then keeps the big gradient reductions on ICI and sends
    only the per-slice partial sums across DCN.
    """
    devices = devices if devices is not None else jax.devices()
    num_slices = max(getattr(d, "slice_index", 0) for d in devices) + 1
    if num_slices <= 1:
        # single slice: degenerate dcn axis of size 1
        per = len(devices) // ici_model
        arr = np.asarray(devices).reshape(1, per, ici_model)
        return Mesh(arr, ("dcn", "data", "model"))
    from jax.experimental import mesh_utils

    per_slice = len(devices) // num_slices
    arr = mesh_utils.create_hybrid_device_mesh(
        (per_slice // ici_model, ici_model),
        (num_slices, 1),
        devices=devices,
    )
    # hybrid mesh returns [dcn*data, model]; reshape to expose dcn
    arr = np.asarray(arr).reshape(num_slices, per_slice // ici_model, ici_model)
    return Mesh(arr, ("dcn", "data", "model"))
