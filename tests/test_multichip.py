"""SPMD correctness: the sharded train step computes the same update as the
single-device step (XLA collectives must be semantics-preserving)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch, replicated, data_sharding
from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step


def _setup(rng):
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    clean = rng.standard_normal((8, 3200)).astype(np.float32) * 0.1
    noise = rng.standard_normal((8, 3200)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    feat = model.compress(jnp.abs(stft(batch["noisy"], scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    return model, cfg, batch, state


@pytest.mark.slow
def test_sharded_step_matches_single_device(rng):
    model, cfg, batch, state = _setup(rng)
    step = jax.jit(make_train_step(model, cfg))

    # single-device reference
    ref_state, ref_metrics = step(state, batch)

    # 4-device data parallel + 2-way model parallel
    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = param_shardings(mesh, state.params)
    sharded = state._replace(
        params=jax.device_put(state.params, p_sh),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), state.opt_state
        ),
        balancer_state=jax.device_put(state.balancer_state, replicated(mesh)),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    sh_batch = shard_batch(mesh, batch)
    new_state, metrics = step(sharded, sh_batch)

    for k in ref_metrics:
        np.testing.assert_allclose(float(metrics[k]), float(ref_metrics[k]), rtol=2e-3)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    new_leaves = jax.tree_util.tree_leaves(new_state.params)
    worst = max(
        float(jnp.abs(a - b).max()) for a, b in zip(ref_leaves, new_leaves)
    )
    # Adam's first step is ~ lr * sign(g): cross-shard reduction-order noise
    # on near-zero gradients can flip signs, so the bound is 2*lr, not eps.
    assert worst <= 2.0 * cfg.learning_rate + 1e-6, (
        f"sharded vs single-device param divergence {worst}"
    )
    # but the vast majority of parameters must agree tightly
    total = sum(a.size for a in ref_leaves)
    mismatched = sum(
        int(jnp.sum(jnp.abs(a - b) > 1e-4)) for a, b in zip(ref_leaves, new_leaves)
    )
    assert mismatched / total < 0.02, f"{mismatched}/{total} params diverged"


def test_trainer_on_mesh_matches_single_device(rng, tmp_path):
    """The user-facing Trainer (the CLI path) on an 8-device mesh produces the
    same loss trajectory as single-device training -- the reference's
    DDP-by-default entry (tools/train_stand.py:151-155) done as SPMD."""
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig

    scfg = StftConfig(n_fft=320, hop_length=160)
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    clean = rng.standard_normal((4, 8, 3200)).astype(np.float32) * 0.1
    noise = rng.standard_normal((4, 8, 3200)).astype(np.float32) * 0.1
    batches = [
        {"noisy": jnp.asarray(clean[i] + noise[i]), "clean": jnp.asarray(clean[i])}
        for i in range(4)
    ]
    feat = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4)).compress(
        jnp.abs(stft(batches[0]["noisy"], scfg))
    )

    def run(mesh, save_dir):
        model = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
        tcfg = TrainerConfig(
            epochs=1, steps_per_epoch=4, validation_interval=10**9,
            save_checkpoint_interval=1, save_dir=str(save_dir), experiment_name="m",
        )
        trainer = Trainer(
            model, cfg, tcfg, train_batches=list(batches),
            example_feat=feat, writer=False, mesh=mesh,
        )
        losses = []
        orig = trainer._train_step

        def spy(state, batch):
            state, metrics = orig(state, batch)
            losses.append(float(metrics["loss_si_snr"]))
            return state, metrics

        trainer._train_step = spy
        trainer.train()
        return losses, trainer

    mesh = make_mesh(n_data=4, n_model=2)
    ref_losses, _ = run(None, tmp_path / "single")
    mesh_losses, mesh_trainer = run(mesh, tmp_path / "mesh")
    np.testing.assert_allclose(mesh_losses, ref_losses, rtol=2e-3)

    # checkpoint written from sharded state round-trips back onto the mesh
    from cruse_tpu.train.checkpoint import restore_checkpoint

    restored, start_epoch, _ = restore_checkpoint(
        mesh_trainer.checkpoints_dir, mesh_trainer.state
    )
    assert start_epoch == 2
    restored = mesh_trainer._place_on_mesh(restored)
    got = jax.device_get(restored.params)
    want = jax.device_get(mesh_trainer.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_grouped_weights_actually_sharded(rng):
    model, cfg, batch, state = _setup(rng)
    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = param_shardings(mesh, state.params)
    ggru_sh = p_sh["ggru"]["bank1"]["w_hh"]
    assert "model" in str(ggru_sh.spec), f"GGRU weights not model-sharded: {ggru_sh.spec}"
    conv_sh = p_sh["enc_0"]["conv"]["kernel"]
    assert conv_sh.spec == jax.sharding.PartitionSpec()  # replicated


@pytest.mark.slow
def test_trainer_on_mesh_with_ema_and_grad_accum(tmp_path, rng):
    """EMA weights and optax.MultiSteps accumulation compose with the mesh:
    the typed opt-state placer must keep MultiStepsState intact (a plain
    tuple() rebuild loses the NamedTuple class and update() crashes)."""
    import jax
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.parallel.mesh import make_mesh
    from cruse_tpu.train.step import StepConfig
    from cruse_tpu.train.trainer import Trainer, TrainerConfig

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, ema_decay=0.9, grad_accum_steps=2)
    clean = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32) * 0.1)
    noisy = clean + jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32) * 0.1)
    feat = model.compress(jnp.abs(stft(noisy, scfg)))
    tr = Trainer(
        model, cfg,
        TrainerConfig(epochs=1, steps_per_epoch=2, sr=16000,
                      save_dir=str(tmp_path), experiment_name="ema_mesh"),
        train_batches=lambda: iter([{"noisy": noisy, "clean": clean}] * 2),
        validation_batches=[{"noisy": noisy, "clean": clean}],
        example_feat=feat, rng=jax.random.PRNGKey(0), writer=False, mesh=mesh,
    )
    tr.train()
    assert int(tr.state.step) == 2
    assert tr.state.ema_params is not None
    leaf = np.asarray(jax.tree_util.tree_leaves(tr.state.ema_params)[0])
    assert np.isfinite(leaf).all()


def test_pod_mesh_data_sharding_and_step(rng):
    """A ("dcn", "data", "model") pod mesh (distributed.make_pod_mesh
    topology): the batch must shard over BOTH dcn and data (cross-slice
    data parallelism, not per-slice replication), and the sharded step
    matches the flat-mesh result."""
    from jax.sharding import Mesh

    model, cfg, batch, state = _setup(rng)
    step = jax.jit(make_train_step(model, cfg))
    flat = make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    pod = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4, 1),
               ("dcn", "data", "model"))

    sh = data_sharding(pod, 2)
    placed = jax.device_put(batch["noisy"], sh)
    # 8 distinct single-row shards -> truly partitioned over dcn x data
    assert len({d.index[0] for d in placed.addressable_shards}) == 8

    def run(mesh):
        st = jax.device_put(state, replicated(mesh))
        b = {k: jax.device_put(v, data_sharding(mesh, v.ndim))
             for k, v in batch.items()}
        _, m = step(st, b)
        return float(m["loss_si_snr"])

    np.testing.assert_allclose(run(pod), run(flat), rtol=1e-5)

    # degenerate single-slice pod mesh from the constructor
    from cruse_tpu.parallel.distributed import make_pod_mesh

    pm = make_pod_mesh(ici_model=1)
    assert pm.axis_names == ("dcn", "data", "model")
    assert pm.shape["dcn"] == 1
