"""Multi-process SPMD worker: one of N processes joined by
`jax.distributed.initialize`, each owning a slice of an 8-device virtual CPU
mesh. Runs ONE global train step on a deterministic batch and prints the
loss — the true multi-host path (cross-process gradient psum over the
distributed runtime) that single-process virtual meshes can't exercise.

Launched by tests/test_multiprocess.py:
    python tests/mp_worker.py <coordinator> <num_processes> <process_id> [mode]
mode "step" (default): one raw global train step.
mode "trainer": the full Trainer class over the global mesh — epoch loop,
replicated validation, coordinator-only checkpointing (trainer.py's
multi-process path).
Env (set by the launcher, BEFORE jax import): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# the axon sitecustomize re-pins the TPU platform; config wins over env
jax.config.update("jax_platforms", "cpu")

# share the suite's persistent compile cache (identical graphs across runs;
# each worker process otherwise recompiles the whole trainer)
_cache = os.environ.get("CRUSE_TPU_TEST_CACHE", "/root/.cache/cruse_tpu_jax_cache")
if _cache != "0":
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def run_trainer(mesh, save_dir: str, process_id: int,
                expect_multiprocess: bool = True) -> float:
    """Drive the FULL Trainer over the mesh: 1 epoch of 2 deterministic
    steps, replicated validation scoring, coordinator-only checkpoint
    write. Prints the composite validation score and returns it.
    `expect_multiprocess=False` lets tests reuse this exact setup as the
    single-process numerical reference (same seeds/batches/config)."""
    import jax.numpy as jnp

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig

    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    step_cfg = StepConfig(stft=scfg, learning_rate=1e-3)

    rng = np.random.default_rng(0)

    def batches():
        # identical global batches on every process (put_global slices
        # out this process's addressable shards)
        r = np.random.default_rng(1)
        for _ in range(2):
            clean = r.standard_normal((8, 4800)).astype(np.float32) * 0.1
            noise = r.standard_normal((8, 4800)).astype(np.float32) * 0.1
            yield {"noisy": clean + noise, "clean": clean}

    vclean = rng.standard_normal((2, 4800)).astype(np.float32) * 0.1
    vnoise = rng.standard_normal((2, 4800)).astype(np.float32) * 0.1
    vbatches = [{"noisy": vclean + vnoise, "clean": vclean}]

    feat = model.compress(jnp.abs(stft(jnp.asarray(vbatches[0]["noisy"][:1]), scfg)))
    tcfg = TrainerConfig(
        epochs=1, steps_per_epoch=2, save_dir=save_dir,
        experiment_name=f"mp{process_id}", metrics=("STOI", "SI_SDR"),
        visualization_examples=0,
    )
    trainer = Trainer(
        model, step_cfg, tcfg,
        train_batches=batches, validation_batches=lambda: iter(vbatches),
        example_feat=feat, writer=False, mesh=mesh,
    )
    if expect_multiprocess:
        assert trainer._multiprocess, "mesh should span processes"
    trainer.train()
    ckpts = sorted(p.name for p in (trainer.checkpoints_dir).iterdir())
    print(f"MP_TRAINER {process_id} {trainer.best_score:.6f} "
          f"ckpts={','.join(ckpts) if ckpts else 'NONE'}", flush=True)
    first_score = trainer.best_score
    if not expect_multiprocess:
        return first_score

    # resume phase: EVERY process restores from the coordinator's dir (the
    # shared-filesystem contract of real multi-host runs) and trains one
    # more global epoch
    tcfg2 = TrainerConfig(
        epochs=2, steps_per_epoch=2, save_dir=save_dir,
        experiment_name="mp0", metrics=("STOI", "SI_SDR"),
        visualization_examples=0,
    )
    trainer2 = Trainer(
        model, step_cfg, tcfg2,
        train_batches=batches, validation_batches=lambda: iter(vbatches),
        example_feat=feat, writer=False, mesh=mesh, resume=True,
    )
    assert trainer2.start_epoch == 2, trainer2.start_epoch
    trainer2.train()
    print(f"MP_RESUME {process_id} {trainer2.best_score:.6f}", flush=True)
    return first_score


def run_gan(mesh, save_dir: str, process_id: int,
            expect_multiprocess: bool = True) -> dict:
    """MetricGAN+ over the mesh: D pretraining (split PESQ scoring), two
    full alternations (the second exercises the replay path), and prints
    the step-2 D/G losses. With `expect_multiprocess=False` this exact
    setup doubles as the single-process same-mesh numerical reference
    (round-4 VERDICT item 2's 'done' criterion)."""
    import jax.numpy as jnp

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.metricgan import metricgan_train_batch
    from cruse_tpu.train.step import StepConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig

    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4), rnn_groups=2))
    rng = np.random.default_rng(3)
    clean = rng.standard_normal((8, 4800)).astype(np.float32) * 0.1
    noise = rng.standard_normal((8, 4800)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"][:1], scfg)))
    trainer = Trainer(
        model,
        StepConfig(stft=scfg, learning_rate=1e-3),
        TrainerConfig(
            epochs=1, steps_per_epoch=2, save_dir=save_dir,
            experiment_name=f"gan{process_id}", metrics=("SI_SDR",),
            visualization_examples=0, validation_interval=10,
            adversarial={"adv_weight": 0.5, "disc_lr": 1e-4, "ndf": 4,
                         "replay_capacity": 4, "pretrain_steps": 1},
        ),
        train_batches=lambda: iter([batch, batch]),
        validation_batches=lambda: iter([batch]),
        example_feat=feat, writer=False, mesh=mesh,
    )
    if expect_multiprocess:
        assert trainer._multiprocess, "mesh should span processes"
    trainer._pretrain_discriminator()
    b = trainer._put_batch({"noisy": batch["noisy"], "clean": batch["clean"]})
    metrics = None
    for _ in range(2):  # second alternation replays a historical batch
        mg, metrics = metricgan_train_batch(
            trainer._mg_state(), b, trainer._adv["steps"], sr=16000,
            replay=trainer._adv["replay"], put=trainer._put_array,
            mesh=trainer.mesh)
        trainer._mg_sync(mg)
    vals = {k: float(metrics[k])
            for k in ("disc_loss", "gen_loss", "task_loss", "adv_loss")}
    print(f"MP_GAN {process_id} " + " ".join(
        f"{vals[k]:.6f}" for k in ("disc_loss", "gen_loss", "task_loss",
                                   "adv_loss")), flush=True)
    return vals


def main(coordinator: str, num_processes: int, process_id: int,
         mode: str = "step") -> None:
    from cruse_tpu.parallel.distributed import initialize_distributed

    ok = initialize_distributed(coordinator, num_processes, process_id)
    assert ok, "initialize_distributed returned False in a configured launch"
    assert jax.process_count() == num_processes
    n_global = len(jax.devices())
    assert n_global == 4 * num_processes, (n_global, jax.local_device_count())

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.parallel.mesh import make_mesh, data_sharding
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    n_model = 2 if mode == "trainer_tp" else 1
    mesh = make_mesh(n_data=n_global // n_model, n_model=n_model)

    if mode == "trainer_gan":
        run_gan(mesh, os.environ.get("MP_SAVE_DIR", "/tmp/mp_gan"),
                process_id)
        return

    if mode in ("trainer", "trainer_tp"):
        # trainer_tp: model-axis sharding ACROSS processes -- grouped-GRU
        # weights live as non-addressable global arrays; checkpoint saves
        # go through the Trainer's all-gather-to-replicated collective
        run_trainer(mesh, os.environ.get("MP_SAVE_DIR", "/tmp/mp_trainer"),
                    process_id)
        return

    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    step_cfg = StepConfig(stft=scfg, learning_rate=1e-3)

    # identical deterministic init + batch in every process
    rng = np.random.default_rng(0)
    clean = rng.standard_normal((8, 4800)).astype(np.float32) * 0.1
    noise = rng.standard_normal((8, 4800)).astype(np.float32) * 0.1
    batch_np = {"noisy": clean + noise, "clean": clean}
    feat = model.compress(jnp.abs(stft(jnp.asarray(batch_np["noisy"][:1]), scfg)))
    state = init_train_state(model, step_cfg, jax.random.PRNGKey(0), feat)

    def globalize(x, sharding):
        arr = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    rep = NamedSharding(mesh, P())
    # replicate the whole train state across the global mesh (pure data
    # parallelism; each process materializes only its addressable shards)
    state = jax.tree_util.tree_map(lambda x: globalize(x, rep), state)
    batch = {
        k: globalize(v, data_sharding(mesh, v.ndim)) for k, v in batch_np.items()
    }

    train_step = jax.jit(make_train_step(model, step_cfg), donate_argnums=0)
    new_state, metrics = train_step(state, batch)
    loss = float(metrics["loss_si_snr"])  # fully replicated -> readable
    grad_norm = float(metrics["grad_norm"])
    assert int(jax.device_get(new_state.step.addressable_data(0))) == 1
    print(f"MP_RESULT {process_id} {loss:.6f} {grad_norm:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else "step")
