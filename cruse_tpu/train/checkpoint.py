"""Checkpoint trio: latest / best / per-epoch weights (orbax-backed).

Same artifact roles as the reference (base_trainer.py:186-232):
- ``latest`` -- full state (params, batch stats, optimizer, balancer EMA,
  epoch, best_score), overwritten every save
- ``model_{NNNN}`` -- per-epoch params-only snapshot
- ``best`` -- full state, overwritten on a new best composite score
Resume restores ``latest`` (base_trainer.py:150-184); warm-start preload
loads params-only with missing keys tolerated (_preload_model, :131-148).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from cruse_tpu.train.step import TrainState


def _checkpointer(for_save: bool = False):
    """Multi-process runtimes need two barrier scopes: SAVES are gated to
    the coordinator (Trainer._save), so the save barrier must span ONLY
    process 0 -- the default all-process barrier would deadlock against the
    non-calling processes. RESTORES are called by EVERY process (the
    shared-filesystem resume contract), so they keep the default
    all-process barrier -- a {0}-scoped checkpointer raises on process 1."""
    if for_save and jax.process_count() > 1 and jax.process_index() == 0:
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=0, active_processes={0}
            ),
        )
    return ocp.PyTreeCheckpointer()


def _to_save_tree(state: TrainState, epoch: int, best_score: float) -> dict:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "balancer_total": state.balancer_state.total,
        "balancer_fix": state.balancer_state.fix,
        "step": state.step,
        "ema_params": state.ema_params,
        "epoch": np.asarray(epoch),
        "best_score": np.asarray(best_score, np.float64),
    }


def save_checkpoint(
    ckpt_dir: str | Path,
    state: TrainState,
    epoch: int,
    best_score: float,
    is_best_epoch: bool = False,
) -> None:
    ckpt_dir = Path(ckpt_dir).expanduser().absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    cp = _checkpointer(for_save=True)
    tree = _to_save_tree(jax.device_get(state), epoch, best_score)
    cp.save(ckpt_dir / "latest", tree, force=True)
    # Per-epoch snapshot: when EMA is on, validation/best-model selection ran
    # on the EMA weights, so the deployable snapshot must carry them too
    # (preload_variables prefers them on load).
    snap = {"params": tree["params"]}
    if tree["ema_params"] is not None:
        snap["ema_params"] = tree["ema_params"]
    cp.save(ckpt_dir / f"model_{epoch:04d}", snap, force=True)
    if is_best_epoch:
        cp.save(ckpt_dir / "best", tree, force=True)


def restore_checkpoint(
    ckpt_dir: str | Path, template_state: TrainState, which: str = "latest"
) -> Tuple[TrainState, int, float]:
    """Returns (state, start_epoch, best_score). start_epoch = saved + 1."""
    ckpt_dir = Path(ckpt_dir).expanduser().absolute()
    path = ckpt_dir / which
    assert path.exists(), f"{path} does not exist, can not load checkpoint."
    cp = _checkpointer()
    template = _to_save_tree(jax.device_get(template_state), 0, 0.0)
    try:
        tree = cp.restore(path, item=template)
    except Exception:
        if template["ema_params"] is None:
            raise
        # Resuming with ema_decay newly enabled from a pre-EMA checkpoint:
        # the on-disk tree has no ema_params subtree, so restoring against
        # an EMA-bearing template raises. Confirm from the checkpoint's
        # METADATA that ema_params is genuinely absent before falling back
        # -- any other restore failure (corrupt file, layout mismatch) must
        # fail loudly rather than silently resetting the validated EMA
        # weights to the raw params.
        try:
            on_disk_ema = cp.metadata(path).item_metadata.get("ema_params")
        except Exception:
            on_disk_ema = "unknown"
        if on_disk_ema is not None:
            raise
        from cruse_tpu.utils.logger import log

        template_no_ema = dict(template, ema_params=None)
        tree = cp.restore(path, item=template_no_ema)
        tree["ema_params"] = jax.tree.map(np.copy, tree["params"])
        log(f"checkpoint {path} predates EMA; initialized ema_params from params")
    from cruse_tpu.losses.balancer import BalancerState

    state = TrainState(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        balancer_state=BalancerState(total=tree["balancer_total"], fix=tree["balancer_fix"]),
        step=tree["step"],
        ema_params=tree.get("ema_params"),
    )
    return state, int(tree["epoch"]) + 1, float(tree["best_score"])


def _merge_tree(template, new, stats=None):
    """Merge `new` leaves onto `template` where key and shape match.

    `stats` (optional) is a 2-element list accumulating [merged, kept]
    leaf counts so callers can detect a stale-layout checkpoint (zero
    matches) instead of silently keeping random-init weights."""
    if isinstance(template, dict):
        return {
            k: _merge_tree(v, new.get(k), stats) if isinstance(new, dict) else _merge_tree(v, None, stats)
            for k, v in template.items()
        }
    if new is not None:
        new = np.asarray(new)
        if new.shape == np.shape(template):
            if stats is not None:
                stats[0] += 1
            return new
    if stats is not None:
        stats[1] += 1
    return template


def _merge_checked(template, restored, what: str):
    """_merge_tree with diagnostics: log the match count; error when a
    non-empty checkpoint matches zero leaves (e.g. a pre-rewrite parameter
    layout), so stale checkpoints fail loudly instead of producing garbage."""
    from cruse_tpu.utils.logger import log

    stats = [0, 0]
    merged = _merge_tree(template, restored, stats)
    n_restored = len(jax.tree.leaves(restored)) if restored is not None else 0
    if stats[0] == 0 and stats[1] > 0 and n_restored > 0:
        raise ValueError(
            f"checkpoint {what}: 0 of {stats[1]} template leaves matched the "
            f"{n_restored} restored leaves — the checkpoint's parameter layout "
            "does not correspond to this model (stale snapshot?)"
        )
    if stats[1] > 0 and n_restored > 0:
        log(f"checkpoint {what}: merged {stats[0]} leaves, kept {stats[1]} template leaves")
    return merged


def preload_params(ckpt_path: str | Path, template_params: Any) -> Any:
    """Warm-start: load a params-only snapshot, tolerating missing entries
    (reference strict=False semantics). Missing leaves keep template values."""
    cp = _checkpointer()
    ckpt_path = Path(ckpt_path).expanduser().absolute()
    assert ckpt_path.exists(), f"The file {ckpt_path} does not exist."
    restored = cp.restore(ckpt_path)
    if "params" in restored:
        restored = restored["params"]
    return _merge_checked(jax.device_get(template_params), restored, "params")


def preload_variables(ckpt_path: str | Path, template_variables: Any) -> Any:
    """Inference/export loading: params AND BatchNorm running stats.

    The trainer's checkpoints carry `batch_stats` alongside `params`; an
    enhancement CLI that loads params only would silently run trained
    BN layers with fresh (0/1) running statistics and diverge from the
    trainer's own validation output. Missing entries keep template values
    (params-only snapshots still load; stats stay at init)."""
    cp = _checkpointer()
    ckpt_path = Path(ckpt_path).expanduser().absolute()
    assert ckpt_path.exists(), f"The file {ckpt_path} does not exist."
    restored = cp.restore(ckpt_path)
    template = jax.device_get(
        {
            "params": template_variables["params"],
            "batch_stats": template_variables.get("batch_stats", {}),
        }
    )
    if "params" not in restored:  # bare params tree snapshot
        restored = {"params": restored}
    # When EMA weights are in the checkpoint they are the weights that
    # produced the validated best score (validation scores state.ema_params),
    # so deployment/export must prefer them over the raw training params.
    weights = restored.get("params")
    if restored.get("ema_params") is not None and jax.tree.leaves(restored["ema_params"]):
        from cruse_tpu.utils.logger import log

        log(f"loading EMA weights from {ckpt_path.name} (ema_params present)")
        weights = restored["ema_params"]
    return {
        "params": _merge_checked(template["params"], weights, "params"),
        "batch_stats": _merge_tree(template["batch_stats"], restored.get("batch_stats")),
    }
