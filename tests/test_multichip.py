"""SPMD correctness: the sharded train step computes the same update as the
single-device step (XLA collectives must be semantics-preserving)."""
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


def test_grouped_weights_actually_sharded(rng):
    model, cfg, batch, state = _setup(rng)
    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = param_shardings(mesh, state.params)
    ggru_sh = p_sh["ggru"]["bank1"]["w_hh"]
    assert "model" in str(ggru_sh.spec), f"GGRU weights not model-sharded: {ggru_sh.spec}"
    conv_sh = p_sh["enc_0"]["conv"]["kernel"]
    assert conv_sh.spec == jax.sharding.PartitionSpec()  # replicated
