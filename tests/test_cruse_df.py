"""CRUSE + deep-filter: model wiring, batch/streaming DF equivalence, e2e."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models.cruse import CruseConfig
from cruse_tpu.models.cruse_df import (
    CruseDfConfig,
    CruseDfNet,
    apply_cruse_df,
    apply_cruse_df_streaming,
    df_stream_init,
)


def _cfg():
    return CruseDfConfig(
        cruse=CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4, emit_features=True),
        df_bins=48,
        df_taps_t=2,
        df_taps_f=1,
    )


def test_model_outputs(rng):
    cfg = _cfg()
    net = CruseDfNet(cfg)
    feat = jnp.asarray(np.abs(rng.standard_normal((2, 10, 161))).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), feat)
    (mask, coefs), state = net.apply(v, feat)
    assert mask.shape == (2, 10, 161)
    assert coefs.shape == (2, 10, 48, cfg.num_taps, 2)


def test_model_streaming_matches_batch(rng):
    cfg = _cfg()
    net = CruseDfNet(cfg)
    feat = jnp.asarray(np.abs(rng.standard_normal((1, 12, 161))).astype(np.float32))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), feat)
    (mask_full, coef_full), _ = jax.jit(net.apply)(v, feat)
    step = jax.jit(net.apply)
    state = None
    masks, coefs = [], []
    for t in range(12):
        (m, c), state = step(v, feat[:, t : t + 1], state)
        masks.append(np.asarray(m))
        coefs.append(np.asarray(c))
    np.testing.assert_allclose(np.concatenate(masks, 1), np.asarray(mask_full), atol=1e-5)
    np.testing.assert_allclose(np.concatenate(coefs, 1), np.asarray(coef_full), atol=1e-5)


def test_df_application_streaming_matches_batch(rng):
    cfg = _cfg()
    b, t, f = 2, 14, 161
    spec = jnp.asarray(
        (rng.standard_normal((b, t, f)) + 1j * rng.standard_normal((b, t, f))).astype(np.complex64)
    )
    mask = jnp.asarray(rng.uniform(0, 1, (b, t, f)).astype(np.float32))
    coefs = jnp.asarray(rng.standard_normal((b, t, cfg.df_bins, cfg.num_taps, 2)).astype(np.float32) * 0.3)

    batch_out = np.asarray(apply_cruse_df(spec, mask, coefs, cfg))

    state = df_stream_init(b, cfg)
    outs = []
    for ti in range(t):
        frame, state = apply_cruse_df_streaming(state, spec[:, ti], mask[:, ti], coefs[:, ti], cfg)
        outs.append(np.asarray(frame))
    stream_out = np.stack(outs, axis=1)
    np.testing.assert_allclose(stream_out, batch_out, atol=1e-5)


def test_e2e_enhancement(rng):
    """Full pipeline: identity-ish behavior with a fresh model is finite and
    the DF head actually modifies the low bins."""
    cfg = _cfg()
    scfg = StftConfig(n_fft=320, hop_length=160)
    net = CruseDfNet(cfg)
    wav = jnp.asarray((rng.standard_normal((1, 8000)) * 0.1).astype(np.float32))
    spec = stft(wav, scfg)
    feat = net.compress(jnp.abs(spec))
    v = net.init(jax.random.PRNGKey(0), feat)
    (mask, coefs), _ = net.apply(v, feat)
    enhanced = apply_cruse_df(spec, mask, coefs, cfg)
    out = np.asarray(istft(enhanced, scfg, length=8000))
    assert np.isfinite(out).all()
    masked_only = np.asarray(istft(spec * mask, scfg, length=8000))
    assert np.abs(out - masked_only).max() > 1e-6  # DF changed something
