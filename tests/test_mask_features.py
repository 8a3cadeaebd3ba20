"""Mask compress/decompress round trips + feature utility invariants."""
import numpy as np
import jax
import jax.numpy as jnp

from cruse_tpu.dsp import mask as M
from cruse_tpu.dsp import features as F
from cruse_tpu.dsp import StftConfig, stft


def test_cirm_compress_decompress_roundtrip(rng):
    m = jnp.asarray(rng.uniform(-8, 8, (4, 100)).astype(np.float32))
    rec = M.decompress_cirm(M.compress_cirm(m))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(m), atol=1e-3)


def test_compress_range():
    m = jnp.asarray(np.linspace(-1000, 1000, 999, dtype=np.float32))
    c = np.asarray(M.compress_cirm(m))
    assert (np.abs(c) <= 10.0).all()


def test_complex_irm_identity():
    """cIRM of (noisy, noisy) decompresses to mask == 1 + 0j."""
    rng = np.random.default_rng(0)
    spec = rng.standard_normal((2, 50)) + 1j * rng.standard_normal((2, 50))
    mr, mi = M.build_complex_ideal_ratio_mask(jnp.asarray(spec), jnp.asarray(spec))
    np.testing.assert_allclose(np.asarray(M.decompress_cirm(mr)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(M.decompress_cirm(mi)), 0.0, atol=1e-3)


def test_complex_mul_matches_numpy(rng):
    a = rng.standard_normal((3, 10)) + 1j * rng.standard_normal((3, 10))
    b = rng.standard_normal((3, 10)) + 1j * rng.standard_normal((3, 10))
    r, i = M.complex_mul(
        jnp.asarray(a.real), jnp.asarray(a.imag), jnp.asarray(b.real), jnp.asarray(b.imag)
    )
    np.testing.assert_allclose(np.asarray(r) + 1j * np.asarray(i), a * b, atol=1e-6)


def test_apply_irm_enhances():
    """Oracle IRM applied to a synthetic mixture improves SNR."""
    cfg = StftConfig(n_fft=512, hop_length=160)
    sr = 16000
    t = np.arange(sr) / sr
    clean = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    noise = np.random.default_rng(0).standard_normal((1, sr)).astype(np.float32) * 0.1
    noisy = clean + noise
    s, n = stft(jnp.asarray(clean), cfg), stft(jnp.asarray(noise), cfg)
    y = stft(jnp.asarray(noisy), cfg)
    gain = M.irm(jnp.abs(s), jnp.abs(n))
    from cruse_tpu.dsp import istft

    enhanced = np.asarray(istft(y * gain, cfg, length=sr))
    snr_in = 10 * np.log10(np.sum(clean**2) / np.sum((noisy - clean) ** 2))
    snr_out = 10 * np.log10(np.sum(clean**2) / np.sum((enhanced - clean) ** 2))
    assert snr_out > snr_in + 5


def test_tailor_db_fs():
    y = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    out, rms, scalar = F.tailor_db_fs(y, -25.0)
    got_db = 20 * np.log10(np.sqrt(np.mean(out**2)))
    assert abs(got_db - (-25.0)) < 0.1


def test_activity_detector_silence_vs_speech():
    rng = np.random.default_rng(0)
    loud = rng.standard_normal(16000).astype(np.float32)
    soft = np.zeros(16000, dtype=np.float32)
    soft[:1600] = rng.standard_normal(1600) * 1.0  # 10% active
    assert F.activity_detector(loud) > 0.9
    assert F.activity_detector(soft) < 0.5


def test_frame_vad_shape_and_gating():
    mag = np.zeros((1, 100, 161), np.float32)
    mag[0, 40:60] = 1.0
    vad = np.asarray(F.frame_vad(jnp.asarray(mag)))
    assert vad.shape == (1, 100, 1)
    assert vad[0, 50, 0] == 1.0 and vad[0, 0, 0] == 0.0


def test_subsample_lengths(rng):
    data = rng.standard_normal(1000).astype(np.float32)
    assert len(F.subsample(data, 600, rng=rng)) == 600
    assert len(F.subsample(data, 1500, rng=rng)) == 1500
    a, b = F.aligned_subsample(data, data * 2, 600, rng=rng)
    np.testing.assert_allclose(b, a * 2)


def test_overlap_cat():
    chunks = [jnp.ones((1, 100)) * v for v in (1.0, 2.0, 3.0)]
    out = np.asarray(F.overlap_cat(chunks))
    assert out.shape == (1, 200)
    assert out[0, 0] == 1.0
    assert out[0, 60] == 1.5  # averaged overlap region
    assert out[0, -1] == 3.0


def test_drop_band():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 1, 256, 10)).astype(np.float32))
    out = F.drop_band(x, 2)
    assert out.shape == (6, 1, 128, 10)


def test_ipd_features(rng):
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 4, 50, 161)).astype(np.float32))
    out = F.ipd_features(phase, [(0, 1), (0, 2), (1, 3)], use_sin=True)
    assert out.shape == (2, 6, 50, 161)


def test_directional_feature_computer(rng):
    cfg = StftConfig(n_fft=320, hop_length=160)
    comp = F.DirectionalFeatureComputer(cfg, mic_pairs=[(0, 1), (0, 2)], use_sin_ipd=False)
    y = jnp.asarray(rng.standard_normal((2, 3, 8000)).astype(np.float32) * 0.1)
    feats, mag, phase, real, imag = comp(y)
    t = cfg.num_frames(8000)
    assert feats.shape == (2, t, comp.directional_feature_dim)
    assert mag.shape == (2, 3, t, cfg.num_bins)
    # channel-stacked variant
    comp2 = F.DirectionalFeatureComputer(cfg, [(0, 1)], channel_stacked=True, use_sin_ipd=True)
    feats2, *_ = comp2(y)
    assert feats2.shape == (2, 3, t, cfg.num_bins)  # 1 LPS + 1 cos + 1 sin
    assert np.isfinite(np.asarray(feats2)).all()
