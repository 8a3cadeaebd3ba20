"""MTFAA + BSRNN: shapes, causality, component parity."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from cruse_tpu.models.mtfaa import (
    MtfaaNet,
    MtfaaConfig,
    Banks,
    linear_filter_banks,
    PhaseEncoder,
    TFCM,
    AxialSelfAttention,
)
from cruse_tpu.models.bsrnn import BSRNN, BandSplit, MaskDecoder, apply_three_tap_mask, Discriminator, BAND_WIDTHS
from cruse_tpu.nn.lstm import LSTM


def test_lstm_matches_torch(rng):
    b, t, i, h = 2, 12, 6, 10
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    tl = torch.nn.LSTM(i, h, 1, batch_first=True)
    model = LSTM(hidden_size=h)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = {k: w.detach().numpy() for k, w in tl.named_parameters()}
    params = v["params"]
    params["w_ih"] = jnp.asarray(p["weight_ih_l0"])
    params["w_hh"] = jnp.asarray(p["weight_hh_l0"])
    params["b_ih"] = jnp.asarray(p["bias_ih_l0"])
    params["b_hh"] = jnp.asarray(p["bias_hh_l0"])
    y, _ = model.apply(v, jnp.asarray(x))
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_bilstm_matches_torch(rng):
    b, t, i, h = 2, 8, 4, 6
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    tl = torch.nn.LSTM(i, h, 1, batch_first=True, bidirectional=True)
    model = LSTM(hidden_size=h, bidirectional=True)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = {k: w.detach().numpy() for k, w in tl.named_parameters()}
    params = v["params"]
    for sfx, tsfx in (("", "_l0"), ("_reverse", "_l0_reverse")):
        params[f"w_ih{sfx}"] = jnp.asarray(p[f"weight_ih{tsfx}"])
        params[f"w_hh{sfx}"] = jnp.asarray(p[f"weight_hh{tsfx}"])
        params[f"b_ih{sfx}"] = jnp.asarray(p[f"bias_ih{tsfx}"])
        params[f"b_hh{sfx}"] = jnp.asarray(p[f"bias_hh{tsfx}"])
    y, _ = model.apply(v, jnp.asarray(x))
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_linear_fbank_partition():
    fb = linear_filter_banks(64, 512, 16000)
    assert fb.shape == (64, 257)
    assert (fb >= 0).all()
    # interior bins are covered (triangles overlap to ~1)
    coverage = fb.sum(axis=0)
    assert coverage[10:-10].min() > 0.5


def test_banks_roundtrip_quality(rng):
    banks = Banks(128, 512, 16000)
    amp = jnp.asarray(np.abs(rng.standard_normal((2, 10, 257))).astype(np.float32))
    # reference quirk preserved: analysis is filter*1.3 while synthesis is
    # pinv(filter) -> round trip carries the 1.3 factor (mtfaa.py:227-228)
    rec = np.asarray(banks.bank2amp(banks.amp2bank(amp))) / 1.3
    rel = np.linalg.norm(rec - np.asarray(amp)) / np.linalg.norm(np.asarray(amp))
    assert rel < 0.75  # pinv projection of out-of-span noise is lossy
    # smooth (band-limited) spectra reconstruct well
    smooth = jnp.asarray(np.tile(np.linspace(1.0, 2.0, 257, dtype=np.float32), (1, 4, 1)))
    rec2 = np.asarray(banks.bank2amp(banks.amp2bank(smooth))) / 1.3
    rel2 = np.linalg.norm(rec2[0, 0, 5:-5] - np.asarray(smooth)[0, 0, 5:-5]) / np.linalg.norm(
        np.asarray(smooth)[0, 0, 5:-5]
    )
    assert rel2 < 0.05


def test_phase_encoder_shapes(rng):
    # T-minor component layout: [B, F, C(real||imag), T]
    pe = PhaseEncoder(cout=4, n_sig=1)
    cspec = jnp.asarray(rng.standard_normal((2, 65, 2, 12)).astype(np.float32))
    v = pe.init(jax.random.PRNGKey(0), [cspec])
    out, _ = pe.apply(v, [cspec])
    assert out.shape == (2, 65, 4, 12)
    assert (np.asarray(out) >= 0).all()  # it's a compressed magnitude


def test_tfcm_residual_and_causal(rng):
    # [B, K, C, T]: causality is along the minor (time) axis
    tfcm = TFCM(8, num_layers=3)
    x = rng.standard_normal((1, 16, 8, 20)).astype(np.float32)
    v = tfcm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1, _ = tfcm.apply(v, jnp.asarray(x))
    assert y1.shape == x.shape
    x2 = x.copy()
    x2[..., 12:] *= 4.0
    y2, _ = tfcm.apply(v, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1)[..., :12], np.asarray(y2)[..., :12], atol=1e-5)


def test_asa_causal_in_time(rng):
    asa = AxialSelfAttention(8, causal=True)
    x = rng.standard_normal((1, 6, 8, 10)).astype(np.float32)  # [B, F, C, T]
    v = asa.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1, _ = asa.apply(v, jnp.asarray(x))
    x2 = x.copy()
    x2[..., 6:] += 2.0
    y2, _ = asa.apply(v, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1)[..., :6], np.asarray(y2)[..., :6], atol=1e-5)


def test_asa_banded_equals_full_when_window_covers(rng):
    """O(T*W) banded attention == full causal attention when W >= T (same
    params); longer sequences are validated by the streaming parity test."""
    asa = AxialSelfAttention(8, causal=True, window=4)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 15)).astype(np.float32))
    v = asa.init(jax.random.PRNGKey(0), x)
    banded_long, _ = asa.apply(v, x)
    assert np.isfinite(np.asarray(banded_long)).all()

    asa_full = AxialSelfAttention(8, causal=True, window=None)
    full, _ = asa_full.apply(v, x[..., :4])
    banded_short, _ = asa.apply(v, x[..., :4])  # window=4 >= T=4 -> identical
    np.testing.assert_allclose(np.asarray(banded_short), np.asarray(full), atol=1e-5)


def test_asa_streaming_matches_windowed_batch(rng):
    asa = AxialSelfAttention(8, causal=True, window=4)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 12)).astype(np.float32))
    v = asa.init(jax.random.PRNGKey(0), x)
    full, _ = asa.apply(v, x)
    state = asa.init_stream_state(2, 6)
    outs = []
    for t in range(12):
        y, state = asa.apply(v, x[..., t : t + 1], state)
        outs.append(np.asarray(y))
    stream = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(stream, np.asarray(full), atol=1e-5)


def test_mtfaa_full_forward(rng):
    cfg = MtfaaConfig(n_fft=512, n_bands=64, channels=(8, 12, 16), tfcm_layers=2)
    net = MtfaaNet(cfg)
    cspec = jnp.asarray(rng.standard_normal((1, 12, 257, 2)).astype(np.float32))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), cspec)
    (out, mask), _ = jax.jit(net.apply)(v, cspec)
    assert out.shape == (1, 12, 257) and out.dtype == jnp.complex64
    assert np.isfinite(np.asarray(out)).all()


def test_mtfaa_chunk_carry_matches_full(rng):
    """Windowed batch calls return usable state: processing two chunks with
    carried state must equal one full-sequence call (incl. ASA KV caches)."""
    cfg = MtfaaConfig(n_fft=512, n_bands=64, channels=(8, 12, 16), tfcm_layers=1,
                      attention_window=4, use_deep_filter=True)
    net = MtfaaNet(cfg)
    cspec = jnp.asarray(rng.standard_normal((1, 8, 257, 2)).astype(np.float32) * 0.3)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), cspec)
    apply = jax.jit(net.apply)
    (full, _), _ = apply(v, cspec)
    (o1, _), st = apply(v, cspec[:, :5])  # batch call WITH window -> state
    (o2, _), _ = apply(v, cspec[:, 5:], st)  # carried into the next chunk
    stitched = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)
    np.testing.assert_allclose(stitched, np.asarray(full), atol=2e-4)


def test_mtfaa_streaming_matches_batch(rng):
    cfg = MtfaaConfig(n_fft=512, n_bands=64, channels=(8, 12, 16), tfcm_layers=2,
                      attention_window=4)
    net = MtfaaNet(cfg)
    cspec = jnp.asarray(rng.standard_normal((1, 10, 257, 2)).astype(np.float32) * 0.3)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), cspec)
    (full, mask_full), _ = jax.jit(net.apply)(v, cspec)
    state = net.init_state(1)
    step = jax.jit(net.apply)  # one trace, 10 fast calls
    outs = []
    for t in range(10):
        (o, m), state = step(v, cspec[:, t : t + 1], state)
        outs.append(np.asarray(o))
    stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(stream, np.asarray(full), atol=2e-4)


@pytest.mark.slow
def test_mtfaa_train_step(rng):
    """Benchmark config 5: MTFAA end-to-end training step decreases loss."""
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.train.step import (
        StepConfig,
        init_train_state,
        make_train_step,
        complex_model_forward,
    )

    scfg = StftConfig(n_fft=512, hop_length=256)
    cfg = MtfaaConfig(n_fft=512, n_bands=32, channels=(4, 6, 8), tfcm_layers=1,
                      use_deep_filter=False)
    net = MtfaaNet(cfg)
    step_cfg = StepConfig(stft=scfg, learning_rate=1e-3)

    clean = rng.standard_normal((2, 4096)).astype(np.float32) * 0.1
    noise = rng.standard_normal((2, 4096)).astype(np.float32) * 0.1
    batch = {"noisy": jnp.asarray(clean + noise), "clean": jnp.asarray(clean)}
    spec = stft(batch["noisy"], scfg)
    cspec_ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    state = init_train_state(net, step_cfg, jax.random.PRNGKey(0), cspec_ri)
    step = jax.jit(make_train_step(net, step_cfg, forward=complex_model_forward(net)))
    first = None
    for _ in range(5):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss_si_snr"])
    assert np.isfinite(float(metrics["loss_si_snr"]))
    assert float(metrics["loss_si_snr"]) < first


def test_bsrnn_band_table():
    assert sum(BAND_WIDTHS) == 257 and len(BAND_WIDTHS) == 31


def test_three_tap_mask_identity(rng):
    spec = jnp.asarray(
        (rng.standard_normal((1, 4, 257)) + 1j * rng.standard_normal((1, 4, 257))).astype(np.complex64)
    )
    m = np.zeros((1, 4, 257, 3, 2), np.float32)
    m[..., 1, 0] = 1.0  # center tap = 1 + 0j
    out = apply_three_tap_mask(spec, jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(out), np.asarray(spec), atol=1e-6)


def test_bsrnn_forward(rng):
    net = BSRNN(num_channel=16, num_layer=1)
    spec = jnp.asarray(
        (rng.standard_normal((1, 6, 257)) + 1j * rng.standard_normal((1, 6, 257))).astype(np.complex64)
    )
    v = jax.jit(net.init)(jax.random.PRNGKey(0), spec)
    out, _ = jax.jit(net.apply)(v, spec)
    assert out.shape == (1, 6, 257)
    assert np.isfinite(np.asarray(out)).all()


def test_bsrnn_causal_chunk_carry_matches_full(rng):
    """Causal BSRNN: chunked forward threading the carried state equals one
    full-sequence call (cumulative-norm carries + time-LSTM state), and the
    causal param tree matches the offline variant leaf-for-leaf (same names/
    shapes — offline checkpoints warm-start the causal net directly)."""
    net = BSRNN(num_channel=8, num_layer=1, causal=True)
    spec = jnp.asarray(
        (rng.standard_normal((2, 8, 257)) + 1j * rng.standard_normal((2, 8, 257))).astype(np.complex64)
    )
    v = net.init(jax.random.PRNGKey(0), spec)
    full, _ = net.apply(v, spec)

    state = net.init_state(2)
    outs = []
    for lo, hi in ((0, 3), (3, 4), (4, 8)):  # ragged chunks incl. T=1
        o, state = net.apply(v, spec[:, lo:hi], state)
        outs.append(np.asarray(o))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-5)

    offline = BSRNN(num_channel=8, num_layer=1, causal=False)
    vo = offline.init(jax.random.PRNGKey(0), spec)
    paths = lambda t: {tuple(p) for p, _ in jax.tree_util.tree_leaves_with_path(t)}
    assert paths(v["params"]) == paths(vo["params"])


def test_bsrnn_causal_is_causal(rng):
    """Future frames must not influence past outputs in the causal variant."""
    net = BSRNN(num_channel=8, num_layer=1, causal=True)
    a = (rng.standard_normal((1, 6, 257)) + 1j * rng.standard_normal((1, 6, 257))).astype(np.complex64)
    b = a.copy()
    b[:, 4:] += (1.0 + 0.5j)  # perturb the future only
    v = net.init(jax.random.PRNGKey(0), jnp.asarray(a))
    ya, _ = net.apply(v, jnp.asarray(a))
    yb, _ = net.apply(v, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ya)[:, :4], np.asarray(yb)[:, :4], atol=1e-5)
    assert np.abs(np.asarray(ya)[:, 4:] - np.asarray(yb)[:, 4:]).max() > 1e-3


def test_discriminator(rng):
    d = Discriminator(ndf=4)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 32, 64))).astype(np.float32))
    y = jnp.asarray(np.abs(rng.standard_normal((2, 32, 64))).astype(np.float32))
    v = jax.jit(d.init)(jax.random.PRNGKey(0), x, y)
    out = jax.jit(d.apply)(v, x, y)
    assert out.shape == (2, 1)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1.2).all()
