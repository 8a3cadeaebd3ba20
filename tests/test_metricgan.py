"""MetricGAN alternating training: both nets update, scores drive D."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.models.bsrnn import Discriminator
from cruse_tpu.train.metricgan import (
    MetricGanConfig,
    init_metricgan_state,
    make_metricgan_steps,
    metricgan_train_batch,
)
from cruse_tpu.train.step import StepConfig


def test_metricgan_alternation(rng):
    scfg = StftConfig(n_fft=320, hop_length=160)
    gen = CruseNet(CruseConfig(in_freq=161, channels=(2, 4, 4, 8), rnn_groups=4))
    disc = Discriminator(ndf=4)
    cfg = MetricGanConfig(step=StepConfig(stft=scfg, learning_rate=1e-3), disc_lr=1e-3)

    clean = rng.standard_normal((2, 4800)).astype(np.float32) * 0.1
    noise = rng.standard_normal((2, 4800)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    feat = gen.compress(jnp.abs(stft(batch["noisy"], scfg)))
    mag = jnp.abs(stft(batch["clean"], scfg))

    state = init_metricgan_state(gen, disc, cfg, jax.random.PRNGKey(0), feat, mag)
    steps = make_metricgan_steps(gen, disc, cfg)

    d0 = jax.tree_util.tree_leaves(state.disc_params)[0]
    g0 = jax.tree_util.tree_leaves(state.gen.params)[0]
    for _ in range(2):
        state, metrics = metricgan_train_batch(state, batch, steps)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["task_loss"]))
    assert np.isfinite(float(metrics["adv_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    d1 = jax.tree_util.tree_leaves(state.disc_params)[0]
    g1 = jax.tree_util.tree_leaves(state.gen.params)[0]
    assert np.abs(np.asarray(d0) - np.asarray(d1)).max() > 0, "D did not update"
    assert np.abs(np.asarray(g0) - np.asarray(g1)).max() > 0, "G did not update"
    assert int(state.gen.step) == 2
