"""The concrete trainer: epoch loop, validation scoring, checkpointing, TB.

Implements the trainer the reference implies but never ships (SURVEY.md §2.2:
`BaseTrainer` is abstract and the concrete subclass is absent). Semantics
follow base_trainer.py:378-424: train epoch -> periodic checkpoint ->
periodic validation -> best tracking via the composite score; an
`only_validation` debug mode skips training.

TPU specifics: the jitted SPMD train step does fwd+balancer-bwd+update in one
XLA program; validation enhancement is jitted per utterance-batch; objective
metrics (STOI/SI-SDR, PESQ when available) score on a background host thread
WHILE the next epoch trains -- the chip only runs enhancement at the epoch
boundary, and scores/best-checkpoints are harvested one boundary later
against the state snapshot that was scored (SURVEY §7.2's async-scoring
requirement).
"""
from __future__ import annotations

import dataclasses
import functools
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.metrics.registry import REGISTERED_METRICS, available_metrics, composite_score
from cruse_tpu.parallel.mesh import (
    mesh_spans_processes,
    param_shardings,
    put_global,
    put_tree,
    replicated,
)
from cruse_tpu.train.checkpoint import restore_checkpoint, save_checkpoint, preload_params
from cruse_tpu.train.step import (
    StepConfig,
    TrainState,
    init_train_state,
    make_train_step,
    forward_for_model,
)
from cruse_tpu.utils.logger import log
from cruse_tpu.utils.timing import ExecutionTime


def _tree_identity(state):
    """Module-level identity for the _host_state all-gather jit: a stable
    function object so jit's cache keys one compilation per Trainer, not
    one per checkpoint save."""
    return state


def _is_complex_model(model) -> bool:
    """Models that consume the RI spectrum and emit the enhanced complex
    spectrum directly (vs magnitude-mask models)."""
    from cruse_tpu.models.mtfaa import MtfaaNet
    from cruse_tpu.models.bsrnn import BSRNN

    return isinstance(model, (MtfaaNet, BSRNN))


@functools.lru_cache(maxsize=32)
def _jitted_train_step(model, step_config: StepConfig):
    """Process-wide cache: the jitted train step for a (model, StepConfig)
    pair. Both are frozen dataclasses, so equal configs hash equal; two
    Trainer instances over the same model/config (common in tests, harmless
    in production -- the step is a pure function of its key) share one
    traced+compiled executable instead of re-tracing (~10-40 s each on a
    1-core host)."""
    return jax.jit(
        make_train_step(model, step_config, forward=forward_for_model(model)),
        donate_argnums=0,
    )


@functools.lru_cache(maxsize=32)
def _jitted_enhance(model, scfg):
    """Process-wide cache for the validation enhancement function."""

    def enhance_fn(params, batch_stats, noisy):
        if noisy.ndim == 3:
            from cruse_tpu.dsp.stft import mc_stft

            spec = mc_stft(noisy, scfg)
        else:
            spec = stft(noisy, scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        enhanced_ri, _ = forward_for_model(model)(params, batch_stats, ri, train=False)
        return istft((enhanced_ri[..., 0], enhanced_ri[..., 1]), scfg,
                     length=noisy.shape[-1])

    return jax.jit(enhance_fn)


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 100
    steps_per_epoch: int = 100
    save_checkpoint_interval: int = 1
    validation_interval: int = 1
    save_max_metric_score: bool = True
    patience: int = 0  # stop after N validations without a new best (0 = off;
    # the reference always runs its full epoch budget)
    metrics: tuple = ("STOI", "SI_SDR", "WB_PESQ", "PMOS")
    sr: int = 16000  # validation scoring + TB audio sample rate
    save_dir: str = "runs/exp"
    experiment_name: str = "cruse"
    only_validation: bool = False
    visualization_examples: int = 3
    num_metric_workers: int = 10
    # MetricGAN+ adversarial training ([trainer.adversarial] in the TOML):
    # dict with adv_weight, disc_lr, ndf, replay_capacity, pretrain_steps.
    # None = standard (non-adversarial) training.
    adversarial: Optional[dict] = None
    # [trainer.profiling]: capture a jax.profiler device trace over a window
    # of train steps -- dict with epoch (default 1), start_step (default 1,
    # skipping the compile step), num_steps (default 3), trace_dir (default
    # <logs_dir>/profile). The trace opens in TensorBoard's profile plugin.
    # The reference had no profiler at all (SURVEY.md §5).
    profiling: Optional[dict] = None


class Trainer:
    def __init__(
        self,
        model,
        step_config: StepConfig,
        trainer_config: TrainerConfig,
        train_batches: Optional[Iterable] = None,
        validation_batches: Optional[Iterable] = None,
        resume: bool = False,
        preload_path: str | None = None,
        example_feat=None,
        rng=None,
        writer=None,
        mesh=None,
        teacher=None,
    ):
        self.model = model
        self.step_cfg = step_config
        self.cfg = trainer_config
        self.train_batches = train_batches
        self.validation_batches = validation_batches
        self.scfg = step_config.stft
        # SPMD: a jax.sharding.Mesh makes this trainer multi-device -- params
        # placed by rule (param_shardings), batches sharded over "data". This
        # is the reference's DDP-by-default training entry (mp.spawn per GPU,
        # tools/train_stand.py:151-155 + base_trainer.py:31) done the XLA way:
        # one process, one jitted program, psum over ICI.
        # A mesh spanning several PROCESSES (multi-host: jax.distributed has
        # been initialized and jax.devices() is global) also works: placement
        # builds global arrays from identical per-process host values
        # (put_global), validation batches replicate so outputs are readable
        # everywhere, and only process 0 writes checkpoints/logs scores.
        self.mesh = mesh
        self._multiprocess = mesh is not None and mesh_spans_processes(mesh)
        self._is_coordinator = jax.process_index() == 0
        # model-axis sharding across hosts: params live as non-addressable
        # global arrays. Checkpointing gathers them to replicated first
        # (_host_state, an all-process collective), so saves stay
        # coordinator-written host numpy like the data-parallel path.
        self._gather_identity = None  # _host_state's jitted TP all-gather
        self._tp_multiprocess = (
            self._multiprocess and mesh.shape.get("model", 1) > 1
        )

        self.save_dir = Path(trainer_config.save_dir).expanduser().absolute() / trainer_config.experiment_name
        self.checkpoints_dir = self.save_dir / "checkpoints"
        self.logs_dir = self.save_dir / "logs"
        self.checkpoints_dir.mkdir(parents=True, exist_ok=True)
        self.logs_dir.mkdir(parents=True, exist_ok=True)

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        assert example_feat is not None, "example_feat required to init params"
        self.state = init_train_state(model, step_config, rng, example_feat)
        self.start_epoch = 1
        self.best_score = -np.inf if trainer_config.save_max_metric_score else np.inf

        if resume:
            self.state, self.start_epoch, self.best_score = restore_checkpoint(
                self.checkpoints_dir, self.state
            )
            log(f"Checkpoint loaded; training resumes at epoch {self.start_epoch}.")
        elif preload_path:
            self.state = self.state._replace(params=preload_params(preload_path, self.state.params))
            log(f"Model preloaded from {preload_path}.")
        if self.mesh is not None:
            self.state = self._place_on_mesh(self.state)
            log(f"SPMD mesh: {dict(self.mesh.shape)}")

        if teacher is not None:
            # knowledge distillation ([trainer.distillation]): the frozen
            # teacher's variables close over the step as compile-time
            # constants (it never updates), so the memoized step cache does
            # not apply. teacher = (teacher_model, teacher_variables).
            t_model, t_vars = teacher
            self._train_step = jax.jit(
                make_train_step(model, step_config,
                                forward=forward_for_model(model),
                                teacher=(forward_for_model(t_model), t_vars)),
                donate_argnums=0,
            )
            try:
                self._enhance = _jitted_enhance(model, self.scfg)
            except TypeError:  # unhashable model config
                self._enhance = jax.jit(self._enhance_fn)
            n_t = sum(int(np.prod(p.shape))
                      for p in jax.tree_util.tree_leaves(t_vars["params"]))
            log(f"distillation: teacher {type(t_model).__name__} "
                f"({n_t / 1e6:.3f} M params, frozen)")
        else:
            try:
                self._train_step = _jitted_train_step(model, step_config)
                self._enhance = _jitted_enhance(model, self.scfg)
            except TypeError:  # unhashable model config (e.g. a dict field)
                self._train_step = jax.jit(
                    make_train_step(model, step_config, forward=forward_for_model(model)),
                    donate_argnums=0,
                )
                self._enhance = jax.jit(self._enhance_fn)
        if self._tp_multiprocess:
            # validation must read the enhanced audio on every process; with
            # model-sharded params GSPMD may emit a partitioned output, so
            # pin it replicated (the process-cached jit can't: out_shardings
            # is mesh-specific)
            self._enhance = jax.jit(self._enhance_fn,
                                    out_shardings=replicated(self.mesh))
        self._adv = None
        if trainer_config.adversarial:
            # multi-process meshes: PESQ labels are scored per-process on
            # the local batch rows and rejoin as a data-sharded global array
            # (metricgan._score_sharded); D/G steps stay plain SPMD
            self._init_adversarial(dict(trainer_config.adversarial), resume)
        # writer: None = auto-create TensorBoard, False = disabled, else used
        # (non-coordinator processes never write TB -- one event stream)
        if writer is False or not self._is_coordinator:
            self.writer = None
        elif writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(self.logs_dir.as_posix(), max_queue=5, flush_secs=30)
            except Exception:
                self.writer = None
        else:
            self.writer = writer

        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.state.params))
        log(f"Model parameters: {n_params / 1e6:.3f} million.")

    # ---- MetricGAN+ adversarial training (ref: testBSRNN.py:157-184) ----

    def _init_adversarial(self, adv: dict, resume: bool) -> None:
        """Wire the full MetricGAN+ recipe (train/metricgan.py) into the
        epoch loop: discriminator + optimizer, replay buffer, optional D
        pretraining, D checkpointing alongside the generator trio."""
        import orbax.checkpoint as ocp

        from cruse_tpu.models.bsrnn import Discriminator
        from cruse_tpu.train.metricgan import (
            MetricGanConfig,
            ReplayBuffer,
            make_metricgan_steps,
        )

        disc = Discriminator(ndf=int(adv.get("ndf", 16)))
        mgcfg = MetricGanConfig(
            step=self.step_cfg,
            disc_lr=float(adv.get("disc_lr", 1e-4)),
            adv_weight=float(adv.get("adv_weight", 1.0)),
            ndf=int(adv.get("ndf", 16)),
        )
        steps = make_metricgan_steps(self.model, disc, mgcfg,
                                     forward=forward_for_model(self.model))
        nbins = self.scfg.n_fft // 2 + 1
        ex_mag = jnp.zeros((1, 16, nbins))
        dvars = disc.init(jax.random.PRNGKey(1), ex_mag, ex_mag)
        import optax

        disc_tx = optax.adam(mgcfg.disc_lr)
        disc_params = dvars["params"]
        disc_stats = dvars.get("batch_stats", {})
        disc_opt = disc_tx.init(disc_params)
        if self.mesh is not None:
            # the discriminator is small: replicate its whole state; the
            # batch stays data-sharded so D/G losses reduce over the mesh
            # exactly like the standard step
            rep = replicated(self.mesh)
            disc_params = put_tree(disc_params, rep)
            disc_stats = put_tree(disc_stats, rep)
            disc_opt = put_tree(disc_opt, rep)
        self._adv = {
            "steps": steps,
            "disc_params": disc_params,
            "disc_stats": disc_stats,
            "disc_opt": disc_opt,
            "replay": ReplayBuffer(capacity=int(adv.get("replay_capacity", 32))),
            "pretrain_steps": int(adv.get("pretrain_steps", 0)),
            "pretrained": False,
        }
        log(f"adversarial (MetricGAN+): adv_weight={mgcfg.adv_weight}, "
            f"disc_lr={mgcfg.disc_lr}, ndf={mgcfg.ndf}, "
            f"replay={self._adv['replay'].capacity}, "
            f"pretrain_steps={self._adv['pretrain_steps']}")
        disc_dir = self.checkpoints_dir / "disc_latest"
        if resume and disc_dir.exists():
            cp = ocp.PyTreeCheckpointer()
            tmpl = {k: self._adv[k] for k in ("disc_params", "disc_stats", "disc_opt")}
            restored = cp.restore(disc_dir, item=jax.device_get(tmpl))
            if self.mesh is not None:  # orbax restores host arrays
                rep = replicated(self.mesh)
                restored = {k: put_tree(v, rep) for k, v in restored.items()}
            self._adv.update(restored)
            self._adv["pretrained"] = True  # resumed D is past pretraining
            log("discriminator checkpoint restored.")

    def _mg_state(self):
        from cruse_tpu.train.metricgan import MetricGanState

        return MetricGanState(
            gen=self.state,
            disc_params=self._adv["disc_params"],
            disc_stats=self._adv["disc_stats"],
            disc_opt=self._adv["disc_opt"],
        )

    def _mg_sync(self, mg) -> None:
        self.state = mg.gen
        self._adv.update(
            disc_params=mg.disc_params, disc_stats=mg.disc_stats, disc_opt=mg.disc_opt
        )

    def _save_disc(self) -> None:
        if self._adv is None:
            return
        import orbax.checkpoint as ocp

        cp = ocp.PyTreeCheckpointer()
        tree = jax.device_get(
            {k: self._adv[k] for k in ("disc_params", "disc_stats", "disc_opt")}
        )
        cp.save(self.checkpoints_dir / "disc_latest", tree, force=True)

    def _pretrain_discriminator(self) -> None:
        from cruse_tpu.train.metricgan import pretrain_discriminator
        import itertools

        n = self._adv["pretrain_steps"]
        self._adv["pretrained"] = True
        if n <= 0:
            return
        batches = self.train_batches() if callable(self.train_batches) else self.train_batches
        mg, loss = pretrain_discriminator(
            self._mg_state(), self._adv["steps"], itertools.islice(iter(batches), n),
            sr=self.cfg.sr, replay=self._adv["replay"], put=self._put_array,
            mesh=self.mesh,
        )
        self._mg_sync(mg)
        log(f"D pretraining ({n} metric-scored batches): mean loss {loss:.5f}")

    # ---- SPMD placement ----

    def _place_on_mesh(self, state: TrainState) -> TrainState:
        """Device-put a (host or single-device) train state onto the mesh:
        params by sharding rule, everything else replicated. Checkpoint
        restore round-trips through here (orbax restores host arrays)."""
        from cruse_tpu.parallel.mesh import place_opt_state

        mesh = self.mesh
        p_sh = param_shardings(mesh, state.params)
        rep = replicated(mesh)
        # Adam moments / MultiSteps grad accumulators mirror the param tree
        # -> they take the param shardings (typed placer keeps optax's
        # NamedTuple state classes intact). put_* builds global arrays when
        # the mesh spans processes, device_puts otherwise.
        opt_state = place_opt_state(mesh, state.opt_state, p_sh)
        return state._replace(
            params=put_tree(state.params, p_sh),
            batch_stats=put_tree(state.batch_stats, rep),
            opt_state=opt_state,
            balancer_state=put_tree(state.balancer_state, rep),
            step=put_global(state.step, rep),
            ema_params=(put_tree(state.ema_params, p_sh)
                        if state.ema_params is not None else None),
        )

    def _put_array(self, x):
        """Place ONE host array the way _put_batch would (data-sharded when
        the leading dim divides the mesh's data extent, else replicated).
        Identity off-mesh. Used by the MetricGAN path for host-side values
        (quality scores, replay triples)."""
        if self.mesh is None:
            return x
        return self._put_batch({"x": x})["x"]

    def _put_batch(self, batch, replicate: bool = False):
        """Shard the batch over the mesh's "data" axis (replicating anything
        whose leading dim doesn't divide it, e.g. ragged validation tails).
        `replicate=True` forces full replication -- used by validation on
        multi-process meshes so enhanced outputs stay host-readable."""
        if self.mesh is None:
            return batch
        n_data = self.mesh.shape["data"]
        if "dcn" in self.mesh.axis_names:  # pod mesh: batch shards over both
            n_data *= self.mesh.shape["dcn"]
        rep = replicated(self.mesh)

        def put(x):
            if (not replicate and hasattr(x, "shape") and x.ndim >= 1
                    and x.shape[0] % n_data == 0):
                from cruse_tpu.parallel.mesh import data_sharding

                return put_global(x, data_sharding(self.mesh, x.ndim))
            return put_global(x, rep)

        return {k: put(v) if hasattr(v, "shape") else v for k, v in batch.items()}

    # ---- enhancement used by validation ----

    def _enhance_fn(self, params, batch_stats, noisy):
        """Validation enhancement through the SAME adapter as training.
        noisy: [B, L] or multi-channel [B, M, L]."""
        if noisy.ndim == 3:
            from cruse_tpu.dsp.stft import mc_stft

            spec = mc_stft(noisy, self.scfg)
        else:
            spec = stft(noisy, self.scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        enhanced_ri, _ = forward_for_model(self.model)(params, batch_stats, ri, train=False)
        return istft((enhanced_ri[..., 0], enhanced_ri[..., 1]), self.scfg,
                     length=noisy.shape[-1])

    # ---- epochs ----

    def _profile_window(self, epoch: int):
        """(start, stop) step indices of the configured trace window for this
        epoch, or None."""
        prof = self.cfg.profiling
        if not prof or epoch != int(prof.get("epoch", 1)):
            return None
        start = int(prof.get("start_step", 1))
        return start, start + int(prof.get("num_steps", 3))

    def _train_epoch(self, epoch: int) -> None:
        assert self.train_batches is not None, "no training data configured"
        # callables are re-invoked per epoch (fresh iterator); plain iterables
        # are consumed across epochs (reference DataLoader-style). Factories
        # that accept epoch= get it (curriculum schedules).
        if callable(self.train_batches):
            try:
                batches = self.train_batches(epoch=epoch)
            except TypeError:
                batches = self.train_batches()
        else:
            batches = self.train_batches
        running = {}  # metric -> (sum, finite count, non-finite count)
        window = self._profile_window(epoch)
        tracing = False
        for i, batch in enumerate(batches):
            if getattr(self, "_preempted", None) and self._preempted["flag"]:
                break  # finish the epoch early; caller checkpoints
            if window and i == window[0]:
                trace_dir = str(self.cfg.profiling.get("trace_dir")
                                or self.logs_dir / "profile")
                jax.profiler.start_trace(trace_dir)
                tracing = True
                log(f"profiler: tracing steps {window[0]}..{window[1] - 1} -> {trace_dir}")
            batch = self._put_batch({"noisy": batch["noisy"], "clean": batch["clean"]})
            if self._adv is not None:
                from cruse_tpu.train.metricgan import metricgan_train_batch

                mg, metrics = metricgan_train_batch(
                    self._mg_state(), batch, self._adv["steps"],
                    sr=self.cfg.sr, replay=self._adv["replay"],
                    put=self._put_array, mesh=self.mesh,
                )
                self._mg_sync(mg)
            else:
                self.state, metrics = self._train_step(self.state, batch)
            for k, v in metrics.items():
                v = float(v)
                tot, n, bad = running.get(k, (0.0, 0, 0))
                if not np.isfinite(v):
                    # e.g. MetricGAN's skipped-D sentinel (disc_loss=nan when
                    # PESQ refuses a batch): keep it out of the mean but COUNT
                    # it -- the epoch log flags skipped values loudly so real
                    # divergence cannot hide behind a healthy-looking mean
                    running[k] = (tot, n, bad + 1)
                    continue
                running[k] = (tot + v, n + 1, bad)
            if tracing and i + 1 == window[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                tracing = False
            if i + 1 >= self.cfg.steps_per_epoch:
                break
        if tracing:  # window extended past the epoch's last step
            jax.profiler.stop_trace()
        for k, (tot, n, bad) in running.items():
            mean = tot / max(n, 1)
            if self.writer:
                self.writer.add_scalar(f"Train/{k}", mean, epoch)
            flag = f"  [{bad} NON-FINITE values skipped!]" if bad else ""
            log(f"  epoch {epoch} {k}: {mean:.5f}{flag}")

    def _validation_epoch(self, epoch: int) -> float:
        """Synchronous validation: device enhancement, host scoring, TB
        emission (used by only_validation; the training loop overlaps the
        host-scoring half with the next epoch instead)."""
        noisy_list, clean_list, enhanced_list, names = self._validation_enhance()
        score = self.metrics_visualization(
            noisy_list, clean_list, enhanced_list, list(self.cfg.metrics), epoch
        )
        for j in range(min(self.cfg.visualization_examples, len(names))):
            self.spec_audio_visualization(noisy_list[j], enhanced_list[j], clean_list[j], names[j], epoch)
        return score

    def _validation_enhance(self):
        """The device half of validation: enhance every batch with the
        current (EMA-preferred) weights and pull the audio to host."""
        assert self.validation_batches is not None, "no validation data configured"
        vbatches = self.validation_batches() if callable(self.validation_batches) else self.validation_batches
        noisy_list, clean_list, enhanced_list, names = [], [], [], []
        ref_ch = getattr(getattr(self.model, "config", None), "reference_channel", 0)
        for batch in vbatches:
            # multi-process: replicate so the enhanced output is fully
            # addressable (readable) on every process
            noisy_dev = self._put_batch(
                {"noisy": batch["noisy"]}, replicate=self._multiprocess
            )["noisy"]
            # validate/select-best with the EMA weights when enabled
            eval_params = (self.state.ema_params
                           if self.state.ema_params is not None else self.state.params)
            enhanced = self._enhance(eval_params, self.state.batch_stats, noisy_dev)
            noisy_np = np.asarray(batch["noisy"])
            if noisy_np.ndim == 3:  # MC: score/visualize the reference mic
                noisy_np = noisy_np[:, ref_ch]
            clean_np = np.asarray(batch["clean"])
            enh_np = np.asarray(enhanced)
            default_names = [f"v{len(names) + k}" for k in range(noisy_np.shape[0])]
            batch_names = batch.get("name", default_names)
            for j in range(noisy_np.shape[0]):
                noisy_list.append(noisy_np[j])
                clean_list.append(clean_np[j])
                enhanced_list.append(enh_np[j])
                names.append(batch_names[j])
        return noisy_list, clean_list, enhanced_list, names

    # ---- scoring & visualization (base_trainer.py:272-376 equivalents) ----

    def _score_lists(self, noisy_list, clean_list, enhanced_list, metrics_list) -> dict:
        """Pure host scoring: {metric: (mean_noisy, mean_enhanced)}. Safe to
        run on a background thread (no writer/log side effects)."""
        avail = available_metrics()
        metrics_list = [m for m in metrics_list if avail.get(m, False)]
        assert "STOI" in metrics_list, "'STOI' must be present (drives best-model score)"
        sr = self.cfg.sr
        out = {}
        with ThreadPoolExecutor(max_workers=self.cfg.num_metric_workers) as pool:
            for metric_name in metrics_list:
                fn = REGISTERED_METRICS[metric_name]
                on_noisy = list(pool.map(lambda p: fn(p[0], p[1], sr=sr), zip(clean_list, noisy_list)))
                on_enhanced = list(pool.map(lambda p: fn(p[0], p[1], sr=sr), zip(clean_list, enhanced_list)))
                out[metric_name] = (float(np.mean(on_noisy)), float(np.mean(on_enhanced)))
        return out

    def _emit_validation(self, scores: dict, epoch: int) -> float:
        """TB/log emission of scored validation means -> composite score
        (main-thread half of the async scoring pipeline)."""
        means = {}
        for metric_name, (mean_noisy, mean_enh) in scores.items():
            means[metric_name] = mean_enh
            if self.writer:
                self.writer.add_scalars(
                    f"Validation/{metric_name}", {"Noisy": mean_noisy, "Enhanced": mean_enh}, epoch
                )
            log(f"  {metric_name}: noisy {mean_noisy:.4f} -> enhanced {mean_enh:.4f}")
        return composite_score(means)

    def metrics_visualization(self, noisy_list, clean_list, enhanced_list, metrics_list, epoch) -> float:
        scores = self._score_lists(noisy_list, clean_list, enhanced_list, metrics_list)
        return self._emit_validation(scores, epoch)

    def spec_audio_visualization(self, noisy, enhanced, clean, name, epoch, mark="") -> None:
        if self.writer is None:
            return
        if np.ndim(noisy) == 2:  # multi-channel item: show the reference mic
            ref = getattr(getattr(self.model, "config", None), "reference_channel", 0)
            noisy = noisy[ref]
        sr = self.cfg.sr
        self.writer.add_audio(f"{mark}Speech/{name}_Noisy", noisy[None], epoch, sample_rate=sr)
        self.writer.add_audio(f"{mark}Speech/{name}_Enhanced", enhanced[None], epoch, sample_rate=sr)
        self.writer.add_audio(f"{mark}Speech/{name}_Clean", clean[None], epoch, sample_rate=sr)
        try:
            from cruse_tpu.utils.plot import plot_spectrograms

            fig = plot_spectrograms(
                [noisy, enhanced, clean],
                labels=["noisy", "enhanced", "clean"],
                sr=sr, n_fft=self.scfg.n_fft, hop=self.scfg.hop_length,
            )
            self.writer.add_figure(f"{mark}Spectrogram/{name}", fig, epoch)
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception as e:  # visualization must never kill training
            log(f"spectrogram figure failed: {e}")

    def _host_state(self, state: Optional[TrainState] = None) -> TrainState:
        """Materialize a train state on the host. With model-axis sharding
        across processes the param/optimizer leaves are non-addressable
        global arrays, so this first reshards the whole state to replicated
        via a jitted identity -- an all-gather over ICI that EVERY process
        must execute (collective). Data-parallel / single-process states
        skip straight to device_get."""
        state = state if state is not None else self.state
        if self._tp_multiprocess:
            leaves = jax.tree_util.tree_leaves(state)
            if any(isinstance(l, jax.Array) and not l.is_fully_addressable
                   for l in leaves):
                # one jitted identity per Trainer: a fresh lambda per call
                # would key a new jit cache entry and recompile the
                # all-gather at every checkpoint save / validation stash
                if self._gather_identity is None:
                    rep = replicated(self.mesh)
                    self._gather_identity = jax.jit(
                        _tree_identity, out_shardings=rep)
                state = self._gather_identity(state)
        return jax.device_get(state)

    def _save(self, epoch: int, best: bool = False, state: Optional[TrainState] = None) -> None:
        """Checkpoint write, coordinator-only on multi-process meshes (one
        writer avoids same-path races). `state` overrides self.state -- the
        async validation pipeline saves the snapshot that was actually
        scored. NOTE: with model-axis sharding across hosts the
        materialization is a collective, so every process must call _save
        at the same point (the epoch loop guarantees this; preemption
        signals must be delivered job-wide, which schedulers do)."""
        tree = self._host_state(state)
        if self._is_coordinator:
            save_checkpoint(self.checkpoints_dir, tree,
                            epoch, self.best_score, best)

    def _is_best_epoch(self, score: float) -> bool:
        if self._multiprocess:
            # every process scores its own (replicated) validation copy, so
            # float divergence around the best threshold could split the
            # best/not-best decision across hosts -- with model-axis sharding
            # _save then contains a collective only SOME processes enter
            # (deadlock). Sync to the coordinator's score first so the
            # branch below is bitwise-identical everywhere.
            from jax.experimental import multihost_utils

            score = float(multihost_utils.broadcast_one_to_all(
                np.asarray(score, np.float64)))
        if self.cfg.save_max_metric_score and score >= self.best_score:
            self.best_score = score
            return True
        if not self.cfg.save_max_metric_score and score <= self.best_score:
            self.best_score = score
            return True
        return False

    def train(self) -> None:
        """Epoch loop with preemption-safe checkpointing: SIGTERM/SIGINT
        during training saves `latest` before exiting, so a preempted run
        resumes with `-R` losing at most the current epoch (the reference's
        recovery story is crash -> resume from the last periodic save,
        train_stand.py:101-103; this closes the preemption window)."""
        import signal

        preempted = {"flag": False}

        def _on_term(signum, frame):
            preempted["flag"] = True
            log(f"signal {signum}: checkpointing before exit...")

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:  # not the main thread
                pass

        self._preempted = preempted
        try:
            self._train_loop(preempted)
        finally:
            for sig, h in old_handlers.items():
                signal.signal(sig, h)

    def _harvest_validation(self) -> None:
        """Finish a pending async validation: emit scores/figures on the main
        thread and write `best` from the state snapshot that was scored."""
        if self._pending_val is None:
            return
        epoch, snapshot, future, vis = self._pending_val
        self._pending_val = None
        score = self._emit_validation(future.result(), epoch)
        noisy_list, clean_list, enhanced_list, names = vis
        for j in range(min(self.cfg.visualization_examples, len(names))):
            self.spec_audio_visualization(noisy_list[j], enhanced_list[j], clean_list[j], names[j], epoch)
        if self._is_best_epoch(score):
            self._save(epoch, best=True, state=snapshot)
            self._since_best = 0
        else:
            self._since_best += 1
            if self.cfg.patience and self._since_best >= self.cfg.patience:
                self._stop_early = True
                log(f"early stop: {self._since_best} validations without a "
                    f"new best (patience {self.cfg.patience})")

    def _train_loop(self, preempted) -> None:
        if self._adv is not None and not self._adv["pretrained"] and not self.cfg.only_validation:
            self._pretrain_discriminator()
        # SURVEY §7.2: host metric scoring must not stall the chip -- the
        # device half of validation (enhancement) runs at the epoch boundary,
        # the host half (STOI/PESQ scoring) runs on this single worker while
        # the NEXT epoch trains, and results are harvested one boundary later
        # against the state snapshot that was scored.
        self._pending_val = None
        self._since_best = 0
        self._stop_early = False
        scorer = ThreadPoolExecutor(max_workers=1)
        try:
            for epoch in range(self.start_epoch, self.cfg.epochs + 1):
                if self._stop_early:
                    return
                log(f"{'=' * 15} {epoch} epoch {'=' * 15}")

                if self.cfg.only_validation:
                    score = self._validation_epoch(epoch)
                    if self._is_best_epoch(score):
                        self._save(epoch, best=True)
                    continue

                timer = ExecutionTime()
                self._train_epoch(epoch)

                # harvest BEFORE the periodic `latest` save so the saved
                # best_score is current -- a stale best_score on resume
                # would let a worse later epoch overwrite `best`
                self._harvest_validation()

                if self.cfg.save_checkpoint_interval and epoch % self.cfg.save_checkpoint_interval == 0:
                    self._save(epoch)
                    if self._is_coordinator:
                        self._save_disc()

                if epoch % self.cfg.validation_interval == 0:
                    log(f"[{timer.duration()} seconds] Training finished, validation in progress...")
                    vis = self._validation_enhance()  # device work, now
                    future = scorer.submit(
                        self._score_lists, vis[0], vis[1], vis[2], list(self.cfg.metrics))
                    # host-materialized snapshot: the jitted step DONATES its
                    # input state, so the device buffers we'd want to save at
                    # harvest time are invalidated by the next epoch's first
                    # step -- copy out now (cheap; save would device_get
                    # anyway). Stash only the few visualization clips: the
                    # scoring future holds the full lists until it finishes,
                    # but pinning the whole validation set for an entire
                    # epoch is an unbounded-RAM pattern.
                    keep = self.cfg.visualization_examples
                    vis_small = tuple(x[:keep] for x in vis)
                    self._pending_val = (epoch, self._host_state(), future, vis_small)

                log(f"[{timer.duration()} seconds] Epoch {epoch} finished.")
                if preempted["flag"]:
                    self._harvest_validation()
                    self._save(epoch)
                    if self._is_coordinator:
                        self._save_disc()
                    log(f"preemption checkpoint written at epoch {epoch}; resume with -R.")
                    return
        finally:
            import sys as _sys

            if _sys.exc_info()[0] is None:
                self._harvest_validation()
            else:
                # crash path: do not block on (or raise from) pending
                # scoring -- the original exception must surface unmasked
                self._pending_val = None
            scorer.shutdown(wait=False)
