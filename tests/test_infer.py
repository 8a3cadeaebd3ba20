"""Inference: streaming == offline parity, RTF measurement, batch strategies."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft, istft
from cruse_tpu.models import CruseNet, CruseConfig
from cruse_tpu.infer.streaming import StreamingEnhancer, _steady_envelope
from cruse_tpu.infer.batch import BatchInferencer, InferencerConfig


def _model_and_vars(in_freq=161):
    model = CruseNet(CruseConfig(in_freq=in_freq, channels=(4, 8, 8, 16), rnn_groups=4))
    feat = jnp.zeros((1, 8, in_freq))
    variables = model.init(jax.random.PRNGKey(0), feat)
    return model, variables


def test_steady_envelope_matches_offline_interior():
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    env = _steady_envelope(cfg)
    assert env.shape == (160,)
    assert (env > 0).all()
    # matches the offline OLA envelope in the steady-state interior
    from cruse_tpu.dsp.stft import _ola_envelope

    offline = _ola_envelope(cfg, 10)
    np.testing.assert_allclose(offline[480:640], env, rtol=1e-5)
    # sqrt-hann squared at 50% overlap IS constant
    scfg = StftConfig(n_fft=320, hop_length=160, window="sqrt_hann", center=False)
    senv = _steady_envelope(scfg)
    np.testing.assert_allclose(senv, senv[0], rtol=1e-5)


def test_streaming_matches_offline(rng):
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model, variables = _model_and_vars()
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1

    enhancer = StreamingEnhancer(model, variables, cfg)
    streamed = np.asarray(enhancer.run(jnp.asarray(wav)))

    # offline reference: same model, center=False stft/istft
    spec = stft(jnp.asarray(wav), cfg)
    feat = model.compress(jnp.abs(spec))
    mask, _ = model.apply(variables, feat)
    offline = np.asarray(istft(spec * mask, cfg))

    # primed streaming aligns exactly with offline; compare past the OLA
    # warmup (first n_fft samples where the offline envelope guard differs)
    n = cfg.n_fft
    m = min(streamed.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(streamed[:, n : m - n], offline[:, n : m - n], atol=1e-4)


def test_streaming_cruse_df_matches_offline(rng):
    """The unified StreamingEnhancer drives CruseDfNet (mask + deep-filter
    head) frame-by-frame and matches the offline apply_cruse_df path."""
    from cruse_tpu.models.cruse_df import CruseDfConfig, CruseDfNet, apply_cruse_df

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    mcfg = CruseDfConfig(
        cruse=CruseConfig(in_freq=161, channels=(4, 8, 8, 16), rnn_groups=4, emit_features=True),
        df_bins=32, df_taps_t=1, df_taps_f=1,
    )
    model = CruseDfNet(mcfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 161)))
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1

    enhancer = StreamingEnhancer(model, variables, cfg)
    streamed = np.asarray(enhancer.run(jnp.asarray(wav)))

    spec = stft(jnp.asarray(wav), cfg)
    (mask, coefs), _ = model.apply(variables, model.compress(jnp.abs(spec)))
    offline = np.asarray(istft(apply_cruse_df(spec, mask, coefs, mcfg), cfg))

    n = cfg.n_fft
    m = min(streamed.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(streamed[:, n : m - n], offline[:, n : m - n], atol=1e-4)


def test_streaming_step_api(rng):
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model, variables = _model_and_vars()
    enhancer = StreamingEnhancer(model, variables, cfg)
    state = enhancer.init_state(1)
    hop = jnp.asarray(rng.standard_normal((1, 160)).astype(np.float32))
    out, state = enhancer.step(state, hop)
    assert out.shape == (1, 160)
    out2, state = enhancer.step(state, hop)
    assert np.isfinite(np.asarray(out2)).all()


def test_streaming_rtf_measurement(rng):
    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model, variables = _model_and_vars()
    enhancer = StreamingEnhancer(model, variables, cfg)
    wav = rng.standard_normal((1, 16000)).astype(np.float32)
    rtf = enhancer.measure_rtf(wav, num_frames=10)
    assert rtf > 0


def test_enhance_long_matches_single_pass(tmp_path, rng):
    """Chunked long-audio enhancement ~= one-shot on a causal model."""
    model, variables = _model_and_vars()
    cfg = InferencerConfig(
        type="mag_to_mag",
        stft=StftConfig(n_fft=320, hop_length=160),
        output_dir=str(tmp_path / "x"),
    )
    inf = BatchInferencer(model, variables, cfg)
    wav = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32) * 0.1)
    one_shot = np.asarray(inf._strategy(wav))
    chunked = np.asarray(inf.enhance_long(wav, chunk_seconds=1.0))
    assert chunked.shape == one_shot.shape
    # interiors agree well; chunk-boundary/startup transients are averaged
    err = np.abs(chunked - one_shot)
    agree = 10 * np.log10(np.mean(one_shot**2) / (np.mean(err**2) + 1e-12))
    assert agree > 15.0, f"chunked vs one-shot agreement {agree:.1f} dB"


def test_batch_inferencer_mag_to_mag(tmp_path, rng):
    model, variables = _model_and_vars()
    cfg = InferencerConfig(
        type="mag_to_mag",
        stft=StftConfig(n_fft=320, hop_length=160),
        output_dir=str(tmp_path / "enh"),
    )
    inf = BatchInferencer(model, variables, cfg)
    wav = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    results = inf([{"noisy": wav, "name": ["utt1"]}])
    name, enhanced, rtf = results[0]
    assert name == "utt1"
    assert enhanced.dtype == np.int16 and len(enhanced) == 16000
    assert (tmp_path / "enh" / "utt1.wav").exists()
    assert len(inf.rtf_history) == 1


def test_mag_to_mag_postfilter(tmp_path, rng):
    """Mask post-filters ("sin"/"envelope", the reference's listening-test
    filters, utils/utils.py:345-362) are selectable on the mask strategies."""
    import pytest

    model, variables = _model_and_vars()
    wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    outs = {}
    for pf in (None, "sin", "envelope"):
        cfg = InferencerConfig(
            type="mag_to_mag",
            stft=StftConfig(n_fft=320, hop_length=160),
            output_dir=str(tmp_path / f"pf_{pf}"),
            postfilter=pf,
        )
        outs[pf] = np.asarray(BatchInferencer(model, variables, cfg)._strategy(wav))
        assert np.isfinite(outs[pf]).all()
    assert not np.allclose(outs[None], outs["sin"])
    assert not np.allclose(outs[None], outs["envelope"])

    bad = InferencerConfig(type="mag_to_mag",
                           stft=StftConfig(n_fft=320, hop_length=160),
                           output_dir=str(tmp_path / "bad"), postfilter="nope")
    with pytest.raises(ValueError):
        BatchInferencer(model, variables, bad)._strategy(wav)


def test_step_multi_matches_single_steps(rng):
    """k hops in one dispatch == k single steps, bit-identical."""
    import jax.numpy as jnp
    from cruse_tpu.dsp.stft import StftConfig
    from cruse_tpu.infer.streaming import StreamingEnhancer
    from cruse_tpu.models import CruseNet, CruseConfig

    cfg = StftConfig(n_fft=64, hop_length=32, center=False)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    import jax
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 33)))
    enh = StreamingEnhancer(model, variables, cfg)
    wav = jnp.asarray(rng.standard_normal((2, 32 * 8)).astype(np.float32) * 0.1)

    s1 = enh.init_state(2)
    outs = []
    for i in range(8):
        o, s1 = enh.step(s1, wav[:, i * 32 : (i + 1) * 32])
        outs.append(np.asarray(o))
    single = np.concatenate(outs, axis=-1)

    s2 = enh.init_state(2)
    o_a, s2 = enh.step_multi(s2, wav[:, : 4 * 32])   # k=4
    o_b, s2 = enh.step_multi(s2, wav[:, 4 * 32 :])   # k=4
    multi = np.concatenate([np.asarray(o_a), np.asarray(o_b)], axis=-1)
    np.testing.assert_allclose(multi, single, atol=1e-6)


def test_streaming_mtfaa_matches_offline(rng):
    """The unified StreamingEnhancer drives the windowed MTFAA (the
    deployable low-latency configuration) frame-by-frame: per-hop T=1 calls
    through the carried state (conv/TFCM hists, rolling ASA K/V,
    deep-filter taps) match the offline full-sequence forward."""
    from cruse_tpu.models.mtfaa import MtfaaConfig, MtfaaNet

    cfg = StftConfig(n_fft=256, hop_length=128, center=False)
    mcfg = MtfaaConfig(n_fft=256, n_bands=32, channels=(4, 6, 8),
                      tfcm_layers=2, attention_window=8)
    model = MtfaaNet(mcfg)
    ex = jnp.zeros((1, 6, 129, 2))
    variables = model.init(jax.random.PRNGKey(0), ex, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    wav = rng.standard_normal((2, 6000)).astype(np.float32) * 0.1

    enhancer = StreamingEnhancer(model, variables, cfg)
    streamed = np.asarray(enhancer.run(jnp.asarray(wav)))

    spec = stft(jnp.asarray(wav), cfg)
    ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    (enh, _mask), _ = model.apply(variables, ri)
    offline = np.asarray(istft(enh, cfg))

    n = cfg.n_fft
    m = min(streamed.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(streamed[:, n : m - n], offline[:, n : m - n],
                               atol=2e-4)


def test_run_batched_mesh_matches_single_device(tmp_path, rng):
    """Mesh-sharded corpus inference (`tools/infer.py -N`) writes the same
    audio as the per-utterance flow: sharding the batch over the data axis
    must not change any sample, and ragged lengths are trimmed exactly."""
    from cruse_tpu.parallel.mesh import make_mesh

    model, variables = _model_and_vars()

    def cfg(sub):
        return InferencerConfig(
            type="mag_to_mag",
            stft=StftConfig(n_fft=320, hop_length=160),
            output_dir=str(tmp_path / sub),
        )

    # 5 utterances, ragged lengths (not hop-aligned), batch 4 over 4 devices
    # -> one full batch + a repeated-tail batch
    lengths = [16000, 12003, 8000, 15999, 4801]
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]
    names = [f"utt{i}" for i in range(len(wavs))]

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    sharded = BatchInferencer(model, variables, cfg("mesh"), mesh=mesh)
    got = sharded.run_batched(wavs, names, batch_size=4)
    assert [g[0] for g in got] == names
    assert [len(g[1]) for g in got] == lengths  # trimmed to true lengths
    assert all((tmp_path / "mesh" / f"{n}.wav").exists() for n in names)

    single = BatchInferencer(model, variables, cfg("one"))
    ref = single.run_batched(wavs, names, batch_size=4, write=False)
    for (_, a, _), (_, b, _) in zip(got, ref):
        # sharded XLA fusions reorder float ops; at int16 that is <= 1 LSB
        assert np.max(np.abs(a.astype(np.int32) - b.astype(np.int32))) <= 1


def test_enhance_long_mesh_matches_sequential(tmp_path, rng):
    """With a mesh, enhance_long scatters the 50%-overlap chunks across the
    data axis (whole recording in one SPMD dispatch) and must produce the
    same stitched audio as the sequential chunk loop."""
    from cruse_tpu.parallel.mesh import make_mesh

    model, variables = _model_and_vars()

    def cfg(sub):
        return InferencerConfig(
            type="mag_to_mag",
            stft=StftConfig(n_fft=320, hop_length=160),
            output_dir=str(tmp_path / sub),
        )

    wav = jnp.asarray(rng.standard_normal((1, 50000)).astype(np.float32) * 0.1)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    seq = np.asarray(BatchInferencer(model, variables, cfg("a")).enhance_long(
        wav, chunk_seconds=1.0))
    par = np.asarray(BatchInferencer(model, variables, cfg("b"), mesh=mesh).enhance_long(
        wav, chunk_seconds=1.0))
    assert par.shape == seq.shape == (1, 50000)
    np.testing.assert_allclose(par, seq, atol=2e-5)


def test_streaming_mc_cruse_matches_offline(rng):
    """Real-time multi-mic enhancement: McCruseNet streams [B, M, hop]
    frames (per-frame LPS+IPD front-end is frame-local) and matches the
    offline center=False directional path on the reference mic."""
    from cruse_tpu.dsp.features import directional_features_from_ri
    from cruse_tpu.dsp.stft import mc_stft
    from cruse_tpu.models.mc_cruse import McCruseConfig, McCruseNet

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    mcfg = McCruseConfig(
        mic_pairs=((0, 1), (0, 2)),
        cruse=CruseConfig(in_freq=161, channels=(4, 8), rnn_groups=4),
    )
    model = McCruseNet(mcfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, mcfg.feature_dim)))
    wav = rng.standard_normal((2, 3, 16000)).astype(np.float32) * 0.1

    enhancer = StreamingEnhancer(model, variables, cfg)
    streamed = np.asarray(enhancer.run(jnp.asarray(wav)))

    # offline reference: same features from the center=False MC spectrum
    specs = mc_stft(jnp.asarray(wav), cfg)  # [B, M, T, F]
    ri = jnp.stack([jnp.real(specs), jnp.imag(specs)], axis=-1)
    feats = directional_features_from_ri(
        ri, mcfg.mic_pairs, mcfg.reference_channel, mcfg.use_sin_ipd)
    mask, _ = model.apply(variables, feats)
    offline = np.asarray(
        istft(specs[:, mcfg.reference_channel] * mask, cfg))

    n = cfg.n_fft
    m = min(streamed.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(streamed[:, n : m - n], offline[:, n : m - n], atol=1e-4)


def test_streaming_mc_step_api(rng):
    """Per-hop multi-mic step + step_multi consistency."""
    from cruse_tpu.models.mc_cruse import McCruseConfig, McCruseNet

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    mcfg = McCruseConfig(
        mic_pairs=((0, 1),),
        cruse=CruseConfig(in_freq=161, channels=(4, 8), rnn_groups=4),
    )
    model = McCruseNet(mcfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, mcfg.feature_dim)))
    enh = StreamingEnhancer(model, variables, cfg)
    wav = jnp.asarray(rng.standard_normal((1, 2, 160 * 6)).astype(np.float32) * 0.1)

    s1 = enh.init_state(1)
    outs = []
    for i in range(6):
        o, s1 = enh.step(s1, wav[..., i * 160 : (i + 1) * 160])
        assert o.shape == (1, 160)
        outs.append(np.asarray(o))
    seq = np.concatenate(outs, axis=-1)

    s2 = enh.init_state(1)
    multi, _ = enh.step_multi(s2, wav[..., : 3 * 160])
    np.testing.assert_allclose(np.asarray(multi), seq[:, : 3 * 160], atol=1e-6)


def test_streaming_fullsubnet_matches_offline(rng):
    """FullSubNet (cumulative norm, no look-ahead) streams frame-by-frame
    through the unified enhancer: per-hop cIRM application matches the
    offline center=False complex-mask path exactly (the cumulative norm
    carry makes chunked == full-sequence by construction)."""
    from cruse_tpu.dsp.mask import decompress_cirm, complex_mul
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    model = FullSubNet(FullSubNetConfig(
        num_freqs=161, num_neighbors=2, fb_hidden=16, fb_layers=1,
        sb_hidden=12, sb_layers=1, norm="cumulative_laplace_norm"))
    mag0 = jnp.zeros((1, 4, 161))
    variables = model.init(jax.random.PRNGKey(0), mag0)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1

    enhancer = StreamingEnhancer(model, variables, cfg)
    streamed = np.asarray(enhancer.run(jnp.asarray(wav)))

    spec = stft(jnp.asarray(wav), cfg)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-12)
    crm, _ = model.apply(variables, mag, model.init_state(2))
    crm = decompress_cirm(crm)
    r, i = complex_mul(jnp.real(spec), jnp.imag(spec), crm[..., 0], crm[..., 1])
    offline = np.asarray(istft(jax.lax.complex(r, i), cfg))

    n = cfg.n_fft
    m = min(streamed.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(streamed[:, n : m - n], offline[:, n : m - n], atol=1e-4)


def test_streaming_bsrnn_matches_offline(rng):
    """Causal BSRNN streams frame-by-frame through the unified enhancer and
    matches the offline causal forward (cumulative norms + carried time-LSTM
    state make per-hop == full-sequence by construction). Closes the zoo's
    last streaming hole (round-3 VERDICT weak item 4)."""
    from cruse_tpu.models.bsrnn import BSRNN

    cfg = StftConfig(n_fft=512, hop_length=256, center=False)
    model = BSRNN(num_channel=8, num_layer=1, causal=True)
    spec0 = jnp.zeros((1, 3, 257), jnp.complex64)
    variables = model.init(jax.random.PRNGKey(0), spec0)
    wav = rng.standard_normal((2, 8192)).astype(np.float32) * 0.1

    enhancer = StreamingEnhancer(model, variables, cfg)
    streamed = np.asarray(enhancer.run(jnp.asarray(wav)))

    spec = stft(jnp.asarray(wav), cfg)
    enh, _ = model.apply(variables, spec, model.init_state(2))
    offline = np.asarray(istft(enh, cfg))

    n = cfg.n_fft
    m = min(streamed.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(streamed[:, n : m - n], offline[:, n : m - n], atol=1e-4)


def test_streaming_bsrnn_guards(rng):
    """The offline (GroupNorm-over-T) BSRNN is rejected with an actionable
    message, as is a band-table/num_bins mismatch."""
    import pytest
    from cruse_tpu.models.bsrnn import BSRNN

    model = BSRNN(num_channel=8, num_layer=1, causal=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 257), jnp.complex64))
    with pytest.raises(AssertionError, match="causal"):
        StreamingEnhancer(model, variables,
                          StftConfig(n_fft=512, hop_length=256, center=False))
    causal = BSRNN(num_channel=8, num_layer=1, causal=True)
    cv = causal.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 257), jnp.complex64))
    with pytest.raises(AssertionError, match="band table"):
        StreamingEnhancer(causal, cv,
                          StftConfig(n_fft=320, hop_length=160, center=False))


def test_streaming_fullsubnet_guards(rng):
    """Offline norms and look-ahead are rejected with actionable messages."""
    import pytest
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig

    cfg = StftConfig(n_fft=320, hop_length=160, center=False)
    for bad in (FullSubNetConfig(num_freqs=161, norm="offline_laplace_norm"),
                FullSubNetConfig(num_freqs=161, norm="cumulative_laplace_norm",
                                 look_ahead=2)):
        model = FullSubNet(bad)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 161)))
        with pytest.raises(AssertionError):
            StreamingEnhancer(model, variables, cfg)


def test_enhance_long_mesh_short_recording(tmp_path, rng):
    """A recording with fewer chunks than mesh devices must still shard
    (the filler rows cycle the real chunks instead of over-slicing)."""
    from cruse_tpu.parallel.mesh import make_mesh

    model, variables = _model_and_vars()
    cfg = InferencerConfig(
        type="mag_to_mag",
        stft=StftConfig(n_fft=320, hop_length=160),
        output_dir=str(tmp_path / "s"),
    )
    mesh = make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    # 21000 samples at 1 s chunks -> 2 chunks on 8 devices (pad_rows=6 > n=2)
    wav = jnp.asarray(rng.standard_normal((1, 21000)).astype(np.float32) * 0.1)
    seq = np.asarray(BatchInferencer(model, variables, cfg).enhance_long(
        wav, chunk_seconds=1.0))
    par = np.asarray(BatchInferencer(model, variables, cfg, mesh=mesh).enhance_long(
        wav, chunk_seconds=1.0))
    assert par.shape == seq.shape == (1, 21000)
    np.testing.assert_allclose(par, seq, atol=2e-5)
