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


def _checkpointer():
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
    cp = _checkpointer()
    tree = _to_save_tree(jax.device_get(state), epoch, best_score)
    cp.save(ckpt_dir / "latest", tree, force=True)
    cp.save(ckpt_dir / f"model_{epoch:04d}", {"params": tree["params"]}, force=True)
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
    tree = cp.restore(path, item=template)
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


def _merge_tree(template, new):
    if isinstance(template, dict):
        return {
            k: _merge_tree(v, new.get(k)) if isinstance(new, dict) else v
            for k, v in template.items()
        }
    if new is None:
        return template
    new = np.asarray(new)
    return new if new.shape == np.shape(template) else template


def preload_params(ckpt_path: str | Path, template_params: Any) -> Any:
    """Warm-start: load a params-only snapshot, tolerating missing entries
    (reference strict=False semantics). Missing leaves keep template values."""
    cp = _checkpointer()
    ckpt_path = Path(ckpt_path).expanduser().absolute()
    assert ckpt_path.exists(), f"The file {ckpt_path} does not exist."
    restored = cp.restore(ckpt_path)
    if "params" in restored:
        restored = restored["params"]
    return _merge_tree(jax.device_get(template_params), restored)


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
    return {
        "params": _merge_tree(template["params"], restored.get("params")),
        "batch_stats": _merge_tree(template["batch_stats"], restored.get("batch_stats")),
    }
