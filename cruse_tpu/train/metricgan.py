"""MetricGAN training: a discriminator regresses an objective quality score
and the generator chases the perfect score.

The reference only sketches the pieces (testBSRNN.py: Discriminator,
batch_pesq scorer, LearnableSigmoid); this wires them into the full
MetricGAN+ recipe:

- D step: MSE( D(clean, clean), 1 ) + MSE( D(clean, enhanced), s ) where s is
  the measured quality score of `enhanced` (normalized PESQ: external
  package or the native P.862 pipeline -- scored on the host, outside jit)
- historical replay buffer: past (clean, enhanced, score) triples re-enter
  D training so the metric surrogate doesn't forget earlier generator
  behavior as G moves (the MetricGAN+ "learner history" trick)
- D pretraining: before the alternation, D regresses scores of synthetic
  degradations (noisy mixtures at the batch's own SNRs), so G's adversarial
  gradient is meaningful from step one
- G step: task losses + adv_weight * MSE( D(clean, enhanced), 1 )

Both steps are jitted; the host sits between them only to compute s.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models.bsrnn import Discriminator, batch_quality_scores
from cruse_tpu.train.step import (
    StepConfig,
    TrainState,
    cast_forward,
    forward_for_model,
    init_train_state,
    make_optimizer,
)
from cruse_tpu.losses.sisnr import si_snr_loss


class MetricGanState(NamedTuple):
    gen: TrainState
    disc_params: Any
    disc_stats: Any  # spectral-norm power-iteration state
    disc_opt: Any


@dataclasses.dataclass(frozen=True)
class MetricGanConfig:
    step: StepConfig = StepConfig()
    disc_lr: float = 1e-4
    adv_weight: float = 1.0
    ndf: int = 16


def init_metricgan_state(gen_model, disc: Discriminator, cfg: MetricGanConfig,
                         rng, example_feat, example_mag) -> MetricGanState:
    gen_state = init_train_state(gen_model, cfg.step, rng, example_feat)
    dvars = disc.init(jax.random.fold_in(rng, 1), example_mag, example_mag)
    disc_tx = optax.adam(cfg.disc_lr)
    return MetricGanState(
        gen=gen_state,
        disc_params=dvars["params"],
        disc_stats=dvars.get("batch_stats", {}),
        disc_opt=disc_tx.init(dvars["params"]),
    )


def make_metricgan_steps(gen_model, disc: Discriminator, cfg: MetricGanConfig,
                         forward=None):
    """Returns (enhance_fn, disc_step, gen_step) -- all jittable.

    `forward` is the family adapter (train/step.py forward_for_model), so
    ANY zoo generator (mask models, BSRNN/MTFAA complex models, CRUSE+DF)
    trains adversarially through the same recipe."""
    scfg = cfg.step.stft
    gen_tx = make_optimizer(cfg.step)
    disc_tx = optax.adam(cfg.disc_lr)
    forward = forward if forward is not None else forward_for_model(gen_model)
    if cfg.step.compute_dtype is not None:
        forward = cast_forward(forward, jnp.dtype(cfg.step.compute_dtype))

    def _mags(wav):
        return jnp.abs(stft(wav, scfg))

    def _enhanced_wav(params, batch_stats, noisy, train):
        spec = stft(noisy, scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        out_ri, new_stats = forward(params, batch_stats, ri, train)
        wav = istft((out_ri[..., 0], out_ri[..., 1]), scfg, length=noisy.shape[-1])
        return wav, new_stats

    @jax.jit
    def enhance(state: MetricGanState, noisy):
        wav, _ = _enhanced_wav(state.gen.params, state.gen.batch_stats, noisy,
                               train=False)
        return wav

    @jax.jit
    def disc_step(state: MetricGanState, clean, enhanced, scores):
        clean_mag = _mags(clean)
        enh_mag = _mags(enhanced)

        def loss_fn(p):
            dvars = {"params": p, "batch_stats": state.disc_stats}
            d_clean, vars1 = disc.apply(dvars, clean_mag, clean_mag, True,
                                        mutable=["batch_stats"])
            dvars = {"params": p, "batch_stats": vars1["batch_stats"]}
            d_enh, vars2 = disc.apply(dvars, clean_mag, enh_mag, True,
                                      mutable=["batch_stats"])
            loss = jnp.mean(jnp.square(d_clean - 1.0)) + jnp.mean(
                jnp.square(d_enh - scores[:, None])
            )
            return loss, vars2["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.disc_params)
        updates, new_opt = disc_tx.update(grads, state.disc_opt, state.disc_params)
        new_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(disc_params=new_params, disc_stats=new_stats,
                              disc_opt=new_opt), {"disc_loss": loss}

    @jax.jit
    def gen_step(state: MetricGanState, batch: Dict[str, jax.Array]):
        noisy, clean = batch["noisy"], batch["clean"]
        clean_mag = _mags(clean)

        def loss_fn(p):
            enhanced, new_stats = _enhanced_wav(p, state.gen.batch_stats, noisy,
                                                train=True)
            task = si_snr_loss(enhanced, clean)
            d_enh = disc.apply(
                {"params": state.disc_params, "batch_stats": state.disc_stats},
                clean_mag, _mags(enhanced),
            )
            adv = jnp.mean(jnp.square(d_enh - 1.0))
            return task + cfg.adv_weight * adv, (new_stats, task, adv)

        (loss, (new_stats, task, adv)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.gen.params
        )
        updates, new_opt = gen_tx.update(grads, state.gen.opt_state, state.gen.params)
        new_params = optax.apply_updates(state.gen.params, updates)
        if cfg.step.ema_decay is not None:
            d = cfg.step.ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, q: d * e + (1.0 - d) * q, state.gen.ema_params, new_params
            )
        else:
            new_ema = None
        new_gen = state.gen._replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.gen.step + 1, ema_params=new_ema,
        )
        return state._replace(gen=new_gen), {
            "gen_loss": loss, "task_loss": task, "adv_loss": adv
        }

    return enhance, disc_step, gen_step


def _data_pspec(mesh, ndim: int):
    """PartitionSpec matching parallel.mesh.data_sharding (leading dim over
    the data axes, rest replicated)."""
    from jax.sharding import PartitionSpec as P

    batch_axes = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    return P(batch_axes, *([None] * (ndim - 1)))


def _local_rows(arr, mesh) -> np.ndarray:
    """This process's host rows of a data-sharded global array, in exactly
    the order `_rows_to_global` will reassemble them (multihost_utils'
    local<->global round trip is its documented contract)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.global_array_to_host_local_array(
            arr, mesh, _data_pspec(mesh, arr.ndim)))


def _rows_to_global(local: np.ndarray, mesh):
    """Inverse of _local_rows: per-process local rows -> one data-sharded
    global array (row-aligned with any other array built the same way)."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        np.asarray(local), mesh, _data_pspec(mesh, np.ndim(local)))


def _score_sharded(clean, enhanced, sr: int, mesh):
    """Multi-process quality scoring: each process scores ONLY its local
    batch rows (host PESQ is the expensive part -- this is the cross-host
    split the single-process path doesn't need), then the per-row scalar
    labels rejoin as a data-sharded global array row-aligned with the
    inputs. Returns (global_scores | None, local_clean, local_enh,
    local_scores | None); None means scoring failed on SOME process (the
    failure decision is allgathered so every process takes the same branch
    -- a split decision would desynchronize the jitted D-step collective).
    """
    from jax.experimental import multihost_utils

    lc = _local_rows(clean, mesh)
    le = _local_rows(enhanced, mesh)
    ls = batch_quality_scores(list(lc), list(le), sr=sr)
    ok = np.asarray([ls is not None], np.int32)
    all_ok = bool(np.all(multihost_utils.process_allgather(ok)))
    if not all_ok:
        return None, lc, le, None
    return _rows_to_global(ls, mesh), lc, le, ls


def _spans_processes(mesh) -> bool:
    if mesh is None:
        return False
    from cruse_tpu.parallel.mesh import mesh_spans_processes

    return mesh_spans_processes(mesh)


class ReplayBuffer:
    """Historical (clean, enhanced, score) triples for D replay.

    Bounded FIFO on the host; `sample` draws a random past batch so each D
    update sees one fresh batch and one historical batch.

    Multi-process contract: every process holds its LOCAL batch rows under
    the SAME entry indices (adds happen in lockstep on every process), and
    `sample` uses a deterministic per-instance rng seeded identically -- so
    all processes draw the same entry and the reassembled global replay
    batch is exactly a past global batch."""

    def __init__(self, capacity: int = 32, seed: int = 0):
        self.capacity = capacity
        self._items: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self._items)

    def add(self, clean, enhanced, scores) -> None:
        self._items.append(
            (np.asarray(clean), np.asarray(enhanced), np.asarray(scores, np.float32))
        )
        if len(self._items) > self.capacity:
            self._items.pop(0)

    def sample(self):
        if not self._items:
            return None
        return self._items[self._rng.integers(len(self._items))]


def pretrain_discriminator(
    state: MetricGanState,
    steps,
    batches,
    sr: int = 16000,
    replay: ReplayBuffer | None = None,
    put=None,
    mesh=None,
):
    """D pretraining on metric-scored synthetic degradations: for each
    (noisy, clean) batch the *noisy mixture itself* is the degraded signal
    (its SNR spread spans the score range), so D learns the quality surface
    before G produces anything. Returns (state, mean disc loss).

    `put` (optional) places host arrays onto the trainer's mesh (data-
    sharded) so the jitted D step never mixes committed global arrays with
    uncommitted host values. When `mesh` spans processes, each process
    scores only its local rows and the labels rejoin as a data-sharded
    global array (same split-scoring path as metricgan_train_batch)."""
    _, disc_step, _ = steps
    put = put if put is not None else (lambda x: x)
    multi = _spans_processes(mesh)
    losses = []
    for batch in batches:
        if multi:
            clean, noisy = put(batch["clean"]), put(batch["noisy"])
            scores_g, lc, ln, ls = _score_sharded(clean, noisy, sr, mesh)
            if scores_g is None:
                continue
            state, m = disc_step(state, clean, noisy, scores_g)
            if replay is not None:
                replay.add(lc, ln, ls)
        else:
            clean, noisy = batch["clean"], batch["noisy"]
            scores = batch_quality_scores(
                list(np.asarray(clean)), list(np.asarray(noisy)), sr=sr
            )
            if scores is None:
                continue
            state, m = disc_step(state, put(clean), put(noisy),
                                 put(jnp.asarray(scores)))
            if replay is not None:
                replay.add(clean, noisy, scores)
        losses.append(float(m["disc_loss"]))
    return state, float(np.mean(losses)) if losses else float("nan")


def metricgan_train_batch(
    state: MetricGanState,
    batch,
    steps,
    sr: int = 16000,
    replay: ReplayBuffer | None = None,
    put=None,
    mesh=None,
):
    """One full alternation: enhance -> host quality scoring -> D step (fresh
    batch + one historical replay batch) -> G step. Returns (state, metrics).

    On a mesh, `batch` arrives data-sharded (trainer._put_batch) and `put`
    places the host-side values (scores, replay triples) the same way.
    When `mesh` spans processes, each process runs host PESQ only on its
    LOCAL rows and the tiny per-row labels rejoin as a data-sharded global
    array (the D/G steps themselves are plain SPMD either way); the replay
    buffer then holds local rows on every process (see ReplayBuffer's
    multi-process contract)."""
    enhance, disc_step, gen_step = steps
    put = put if put is not None else (lambda x: x)
    enhanced = enhance(state, batch["noisy"])
    if _spans_processes(mesh):
        scores_g, lc, le, ls = _score_sharded(
            batch["clean"], enhanced, sr, mesh)
        if scores_g is None:  # PESQ refused somewhere -- skip D everywhere
            metrics_d = {"disc_loss": jnp.nan}
        else:
            state, metrics_d = disc_step(state, batch["clean"], enhanced,
                                         scores_g)
            if replay is not None:
                past = replay.sample()
                if past is not None:
                    c, e, s = past
                    state, _ = disc_step(
                        state, _rows_to_global(c, mesh),
                        _rows_to_global(e, mesh), _rows_to_global(s, mesh))
                replay.add(lc, le, ls)
        state, metrics_g = gen_step(state, batch)
        return state, {**metrics_d, **metrics_g}
    scores = batch_quality_scores(
        list(np.asarray(batch["clean"])), list(np.asarray(enhanced)), sr=sr
    )
    if scores is None:  # PESQ refused (silence) -- skip D this round
        metrics_d = {"disc_loss": jnp.nan}
    else:
        state, metrics_d = disc_step(
            state, batch["clean"], enhanced, put(jnp.asarray(scores)))
        if replay is not None:
            past = replay.sample()
            if past is not None:
                c, e, s = past
                state, _ = disc_step(
                    state, put(jnp.asarray(c)), put(jnp.asarray(e)), put(jnp.asarray(s)))
            replay.add(batch["clean"], enhanced, scores)
    state, metrics_g = gen_step(state, batch)
    return state, {**metrics_d, **metrics_g}
