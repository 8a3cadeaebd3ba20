"""Forward-adapter coverage: every zoo model trains and validates through
the same Trainer machinery (regression tests for the adapter crashes)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.models import CruseNet, CruseConfig, BSRNN, features_for_model, build_from_config
from cruse_tpu.models.mtfaa import MtfaaNet, MtfaaConfig
from cruse_tpu.models.cruse_df import CruseDfNet, CruseDfConfig
from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step, forward_for_model


def _batch(rng, b=1, n=4096):
    clean = rng.standard_normal((b, n)).astype(np.float32) * 0.1
    noise = rng.standard_normal((b, n)).astype(np.float32) * 0.1
    return {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}


def _one_step(model, scfg, batch):
    cfg = StepConfig(stft=scfg, learning_rate=1e-3)
    spec = stft(batch["noisy"], scfg)
    feat = features_for_model(model, spec)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg, forward=forward_for_model(model)))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_si_snr"]))
    # eval-mode adapter pass (the validation path)
    ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    out, stats = forward_for_model(model)(state.params, state.batch_stats, ri, train=False)
    assert out.shape == ri.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_bsrnn_trains_through_adapter(rng):
    scfg = StftConfig(n_fft=512, hop_length=256)
    _one_step(BSRNN(num_channel=8, num_layer=1), scfg, _batch(rng))


@pytest.mark.slow
def test_mtfaa_trains_through_adapter(rng):
    scfg = StftConfig(n_fft=512, hop_length=256)
    model = MtfaaNet(MtfaaConfig(n_fft=512, n_bands=32, channels=(4, 6, 8),
                                 tfcm_layers=1, use_deep_filter=False))
    _one_step(model, scfg, _batch(rng))


def test_cruse_df_trains_through_adapter(rng):
    scfg = StftConfig(n_fft=320, hop_length=160)
    model = CruseDfNet(CruseDfConfig(
        cruse=CruseConfig(in_freq=161, channels=(2, 4, 4, 8), emit_features=True),
        df_bins=32, df_taps_t=1, df_taps_f=1,
    ))
    _one_step(model, scfg, _batch(rng))


def test_build_from_config():
    assert isinstance(build_from_config(CruseConfig()), CruseNet)
    assert isinstance(build_from_config(MtfaaConfig()), MtfaaNet)
    assert isinstance(build_from_config(CruseDfConfig()), CruseDfNet)
    m = CruseNet(CruseConfig())
    assert build_from_config(m) is m  # pass-through for ready modules
