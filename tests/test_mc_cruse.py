"""Multi-channel CRUSE: directional features -> mask on the reference
channel. The reference shipped the feature computers (feature.py:423-611)
and an MC inference strategy but no MC model; this tests the consumer."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, mc_stft
from cruse_tpu.models.cruse import CruseConfig
from cruse_tpu.models.mc_cruse import McCruseConfig, McCruseNet


def _mc_batch(rng, b=2, m=3, length=3200, delay=3):
    """Synthetic array: clean + per-mic delayed copies + noise."""
    clean = rng.standard_normal((b, length)).astype(np.float32) * 0.1
    noise = rng.standard_normal((b, m, length)).astype(np.float32) * 0.1
    mc = np.stack(
        [np.roll(clean, i * delay, axis=-1) for i in range(m)], axis=1
    ) + noise
    return {"noisy": jnp.asarray(mc.astype(np.float32)), "clean": jnp.asarray(clean)}


def _small_cfg():
    return McCruseConfig(
        mic_pairs=((0, 1), (0, 2)),
        cruse=CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4),
    )


def test_mc_forward_shapes(rng):
    cfg = _small_cfg()
    model = McCruseNet(cfg)
    feats = jnp.asarray(rng.standard_normal((2, 10, cfg.feature_dim)).astype(np.float32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    mask, _ = jax.jit(model.apply)(v, feats)
    assert mask.shape == (2, 10, 161)
    m = np.asarray(mask)
    assert (m >= 0).all() and (m <= 1).all()


def test_mc_train_step_decreases_loss(rng):
    from cruse_tpu.train.step import (
        StepConfig,
        forward_for_model,
        init_train_state,
        make_train_step,
    )
    from cruse_tpu.dsp.features import directional_features_from_ri

    scfg = StftConfig(n_fft=320, hop_length=160)
    cfg = _small_cfg()
    model = McCruseNet(cfg)
    batch = _mc_batch(rng)
    spec_mc = mc_stft(batch["noisy"], scfg)
    ri = jnp.stack([jnp.real(spec_mc), jnp.imag(spec_mc)], axis=-1)
    feats = directional_features_from_ri(ri, cfg.mic_pairs, 0, cfg.use_sin_ipd)
    step_cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    state = init_train_state(model, step_cfg, jax.random.PRNGKey(0), feats)
    step = jax.jit(make_train_step(model, step_cfg, forward=forward_for_model(model)))
    first = None
    for _ in range(6):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_si_snr"])
    assert np.isfinite(float(metrics["loss_si_snr"]))
    assert float(metrics["loss_si_snr"]) < first, (first, float(metrics["loss_si_snr"]))


def test_mc_inference_strategy(rng, tmp_path):
    from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig
    from cruse_tpu.dsp.features import directional_features_from_ri

    scfg = StftConfig(n_fft=320, hop_length=160)
    cfg = _small_cfg()
    model = McCruseNet(cfg)
    batch = _mc_batch(rng, b=1, length=4800)
    spec_mc = mc_stft(batch["noisy"], scfg)
    ri = jnp.stack([jnp.real(spec_mc), jnp.imag(spec_mc)], axis=-1)
    feats = directional_features_from_ri(ri, cfg.mic_pairs, 0, cfg.use_sin_ipd)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), feats)

    inf = BatchInferencer(model, variables, InferencerConfig(
        type="multi_channel_directional", stft=scfg, output_dir=str(tmp_path / "o")))
    results = inf([{"noisy": np.asarray(batch["noisy"]), "name": ["mc"]}])
    name, enhanced, rtf = results[0]
    assert name == "mc" and len(enhanced) == 4800
    assert np.isfinite(enhanced).all()
