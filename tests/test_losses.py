"""Loss parity vs torch goldens + numerical invariants."""
import numpy as np
import torch
import jax.numpy as jnp

from cruse_tpu.losses import (
    si_snr,
    si_snr_zero_mean,
    rmse_loss,
    compressed_spectral_loss,
    weighted_male_loss,
    sdnr_loss,
    multi_res_spectral_loss,
    get_loss,
)


def _torch_sisnr(s1, s2, eps=1e-8):
    """Golden: projection-form SI-SNR (loss_func/loss.py:48-56)."""
    s1, s2 = torch.from_numpy(s1), torch.from_numpy(s2)
    def l2(a, b):
        return torch.sum(a * b, -1, keepdim=True)
    s_target = l2(s1, s2) / (l2(s2, s2) + eps) * s2
    e_noise = s1 - s_target
    snr = 10 * torch.log10(l2(s_target, s_target) / (l2(e_noise, e_noise) + eps) + eps)
    return float(torch.mean(snr))


def test_si_snr_matches_torch(rng):
    est = rng.standard_normal((4, 8000)).astype(np.float32)
    ref = rng.standard_normal((4, 8000)).astype(np.float32)
    ours = float(si_snr(jnp.asarray(est), jnp.asarray(ref)))
    np.testing.assert_allclose(ours, _torch_sisnr(est, ref), atol=1e-4)


def test_si_snr_perfect_and_scaled(rng):
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    # SI-SNR of the signal with itself is very high
    assert float(si_snr(jnp.asarray(x), jnp.asarray(x))) > 70
    # scale invariance: scaling est must not change SI-SNR materially
    a = float(si_snr(jnp.asarray(x * 3.0), jnp.asarray(x)))
    assert a > 70
    z = float(si_snr_zero_mean(jnp.asarray(x * 0.5), jnp.asarray(x)))
    assert z > 70


def test_si_snr_improvement_ordering(rng):
    clean = rng.standard_normal((1, 8000)).astype(np.float32)
    noise = rng.standard_normal((1, 8000)).astype(np.float32)
    noisy_bad = clean + noise
    noisy_good = clean + 0.1 * noise
    bad = float(si_snr(jnp.asarray(noisy_bad), jnp.asarray(clean)))
    good = float(si_snr(jnp.asarray(noisy_good), jnp.asarray(clean)))
    assert good > bad + 15


def test_compressed_spectral_zero_at_identity(rng):
    spec = rng.standard_normal((2, 10, 33, 2)).astype(np.float32)
    loss = float(compressed_spectral_loss(jnp.asarray(spec), jnp.asarray(spec)))
    assert loss < 1e-8
    other = rng.standard_normal((2, 10, 33, 2)).astype(np.float32)
    assert float(compressed_spectral_loss(jnp.asarray(other), jnp.asarray(spec))) > 0.1


def test_wo_male_weighting(rng):
    """Low-IAM (noise-dominated) bins must be weighted harder."""
    ref = np.abs(rng.standard_normal((1, 5, 16, 2))).astype(np.float32)
    noisy = ref * 10.0  # IAM = 0.1 -> high weight
    est = ref * 1.5
    high_w = float(weighted_male_loss(jnp.asarray(est), jnp.asarray(ref), jnp.asarray(noisy)))
    noisy2 = ref  # IAM = 1 -> lower weight
    low_w = float(weighted_male_loss(jnp.asarray(est), jnp.asarray(ref), jnp.asarray(noisy2)))
    assert high_w > low_w


def test_sdnr_components(rng):
    clean = rng.standard_normal((2, 20, 33)).astype(np.float32) + 1j * rng.standard_normal((2, 20, 33)).astype(np.float32)
    noise = rng.standard_normal((2, 20, 33)).astype(np.float32) + 1j * rng.standard_normal((2, 20, 33)).astype(np.float32)
    ones = jnp.ones((2, 20, 33))
    zeros = jnp.zeros((2, 20, 33))
    snr = jnp.asarray([10.0, 10.0])
    # gain == 1: no speech distortion, full noise leak
    loss_allpass = float(sdnr_loss(jnp.asarray(clean), ones, jnp.asarray(noise), snr))
    # gain == 0: full distortion, no noise
    loss_mute = float(sdnr_loss(jnp.asarray(clean), zeros, jnp.asarray(noise), snr))
    assert loss_allpass > 0 and loss_mute > 0
    # at high SNR, speech distortion dominates -> muting is worse
    loss_mute_hisnr = float(sdnr_loss(jnp.asarray(clean), zeros, jnp.asarray(noise), jnp.asarray([40.0, 40.0])))
    loss_allpass_hisnr = float(sdnr_loss(jnp.asarray(clean), ones, jnp.asarray(noise), jnp.asarray([40.0, 40.0])))
    assert loss_mute_hisnr > loss_allpass_hisnr


def test_multi_res_zero_at_identity(rng):
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    assert float(multi_res_spectral_loss(jnp.asarray(x), jnp.asarray(x))) < 1e-9
    y = rng.standard_normal((1, 8000)).astype(np.float32)
    assert float(multi_res_spectral_loss(jnp.asarray(y), jnp.asarray(x))) > 1e-4


def test_registry():
    fn = get_loss("SI-SNR")
    x = jnp.ones((1, 100))
    assert np.isfinite(float(fn(x, x)))
    import pytest

    with pytest.raises(KeyError):
        get_loss("nope")


def test_cirm_mse_loss_invariants(rng):
    """cIRM MSE (FullSubNet recipe): zero when enhanced == clean (the
    implied mask equals the ideal by construction), positive for the
    identity mask, differentiable."""
    import jax
    from cruse_tpu.losses.spectral import cirm_mse_loss

    noisy = jnp.asarray(rng.standard_normal((2, 12, 9, 2)), jnp.float32)
    clean = noisy * 0.5 + jnp.asarray(
        rng.standard_normal((2, 12, 9, 2)) * 0.1, jnp.float32)
    zero = float(cirm_mse_loss(clean, noisy, clean))
    assert zero < 1e-10, zero
    ident = float(cirm_mse_loss(noisy, noisy, clean))
    assert ident > 1e-3, ident
    g = jax.grad(lambda e: cirm_mse_loss(e, noisy, clean))(noisy * 0.8)
    assert np.isfinite(np.asarray(g)).all()
    # registry binding passes (est, ref=clean, noisy)
    from cruse_tpu.losses.registry import get_loss

    r = float(get_loss("cirm")(clean, clean, noisy=noisy))
    assert r < 1e-10, r


def test_fullsubnet_trains_with_cirm_loss(rng):
    """The cirm loss drives a real train step through the FullSubNet
    adapter and decreases over a few steps (the reference-faithful
    FullSubNet training objective)."""
    import jax
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models.fullsubnet import FullSubNet, FullSubNetConfig
    from cruse_tpu.train.step import (
        StepConfig, init_train_state, make_train_step, forward_for_model)

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = FullSubNet(FullSubNetConfig(
        num_freqs=33, num_neighbors=3, fb_hidden=16, fb_layers=1,
        sb_hidden=12, sb_layers=1))
    cfg = StepConfig(stft=scfg, learning_rate=3e-3,
                     loss_weights=(("cirm", 1.0),))
    clean = jnp.asarray(rng.standard_normal((2, 2000)) * 0.1, jnp.float32)
    noisy = clean + jnp.asarray(
        rng.standard_normal((2, 2000)) * 0.1, jnp.float32)
    feat = jnp.abs(stft(noisy, scfg))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg, forward=forward_for_model(model)))
    losses = []
    for _ in range(6):
        state, m = step(state, {"noisy": noisy, "clean": clean})
        losses.append(float(m["loss_cirm"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def _speechy(rng, n=16000, sr=16000):
    """Synthetic speech-like signal: harmonics with syllabic AM."""
    t = np.arange(n) / sr
    x = sum(
        a * np.sin(2 * np.pi * f0 * k * t)
        for k, a in ((1, 1.0), (2, 0.6), (3, 0.35), (5, 0.15))
        for f0 in (130.0,)
    )
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2
    return (0.1 * x / np.max(np.abs(x))).astype(np.float32)


def test_pmsqe_zero_at_identity_and_monotone(rng):
    """PMSQE is exactly zero for identical spectra and grows with the noise
    level (the PESQ disturbance is monotone in distortion)."""
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.losses import pmsqe_loss

    scfg = StftConfig(n_fft=320, hop_length=160)
    clean = _speechy(rng)
    ref = stft(jnp.asarray(clean)[None], scfg)
    ref_ri = jnp.stack([jnp.real(ref), jnp.imag(ref)], -1)
    assert float(pmsqe_loss(ref_ri, ref_ri)) == 0.0

    noise = rng.standard_normal(clean.shape).astype(np.float32)
    noise *= np.sqrt(np.mean(clean**2) / np.mean(noise**2))  # 0 dB SNR unit
    vals = []
    for snr_db in (30.0, 20.0, 10.0, 0.0):
        deg = clean + noise * 10 ** (-snr_db / 20.0)
        spec = stft(jnp.asarray(deg)[None], scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], -1)
        vals.append(float(pmsqe_loss(ri, ref_ri)))
    assert all(np.isfinite(vals))
    assert all(a < b for a, b in zip(vals, vals[1:])), vals


def test_pmsqe_gradient_and_level_invariance(rng):
    """Finite, nonzero gradients; global gain changes of either signal do
    not move the loss (PESQ level-aligns both signals; the stop-gradient
    scales make the loss train spectral shape, not level)."""
    import jax
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.losses import pmsqe_loss

    scfg = StftConfig(n_fft=320, hop_length=160)
    clean = _speechy(rng)
    deg = clean + 0.03 * rng.standard_normal(clean.shape).astype(np.float32)
    ref = stft(jnp.asarray(clean)[None], scfg)
    est = stft(jnp.asarray(deg)[None], scfg)
    ref_ri = jnp.stack([jnp.real(ref), jnp.imag(ref)], -1)
    est_ri = jnp.stack([jnp.real(est), jnp.imag(est)], -1)

    val, g = jax.value_and_grad(lambda e: pmsqe_loss(e, ref_ri))(est_ri)
    g = np.asarray(g)
    assert np.isfinite(g).all() and float(np.abs(g).max()) > 0.0
    assert float(val) > 0.0

    v1 = float(pmsqe_loss(est_ri, ref_ri))
    v2 = float(pmsqe_loss(est_ri * 3.0, ref_ri))
    v3 = float(pmsqe_loss(est_ri, ref_ri * 0.25))
    np.testing.assert_allclose(v2, v1, rtol=1e-5)
    np.testing.assert_allclose(v3, v1, rtol=1e-5)


def test_pmsqe_tracks_native_pesq_ordering(rng):
    """The training loss orders degradations the same way the native WB-PESQ
    validator does (that agreement is the reason to train with it)."""
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.losses import pmsqe_loss
    from cruse_tpu.metrics.pesq_native import wb_pesq_native

    scfg = StftConfig(n_fft=512, hop_length=256)
    clean = _speechy(rng, n=32000)
    ref = stft(jnp.asarray(clean)[None], scfg)
    ref_ri = jnp.stack([jnp.real(ref), jnp.imag(ref)], -1)
    noise = rng.standard_normal(clean.shape).astype(np.float32)
    noise *= np.sqrt(np.mean(clean**2) / np.mean(noise**2))
    losses, pesqs = [], []
    for snr_db in (25.0, 15.0, 5.0):
        deg = clean + noise * 10 ** (-snr_db / 20.0)
        spec = stft(jnp.asarray(deg)[None], scfg)
        ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], -1)
        losses.append(float(pmsqe_loss(ri, ref_ri)))
        pesqs.append(wb_pesq_native(clean, deg))
    # PESQ decreasing with noise; PMSQE increasing -- identical ordering
    assert pesqs[0] > pesqs[1] > pesqs[2], pesqs
    assert losses[0] < losses[1] < losses[2], losses


def test_pmsqe_registry_and_tables():
    from cruse_tpu.losses import get_loss, pmsqe_tables

    mat, widths, thresh, iscale = pmsqe_tables(320, 16000)
    assert mat.shape == (49, 161) and widths.shape == (49,)
    # every rfft bin above the lowest band edge lands in exactly one band
    cover = np.asarray(mat).sum(axis=0)
    assert cover.max() <= 1.0 + 1e-6
    assert np.asarray(widths).min() > 0 and np.asarray(thresh).min() > 0
    nb_mat, *_ = pmsqe_tables(256, 8000)
    assert nb_mat.shape == (42, 129)

    x = jnp.ones((1, 4, 161, 2))
    assert float(get_loss("pmsqe")(x, x)) == 0.0


def test_cruse_trains_with_pmsqe_loss(rng):
    """PMSQE drives a real balancer train step on a tiny CRUSE and decreases
    over a few steps (perceptual fine-tuning recipe: pmsqe + si_snr)."""
    import jax
    from cruse_tpu.dsp.stft import StftConfig, stft
    from cruse_tpu.models import CruseNet, CruseConfig
    from cruse_tpu.train.step import StepConfig, init_train_state, make_train_step

    scfg = StftConfig(n_fft=64, hop_length=32)
    model = CruseNet(CruseConfig(in_freq=33, channels=(2, 4), rnn_groups=2))
    cfg = StepConfig(stft=scfg, learning_rate=3e-3,
                     loss_weights=(("pmsqe", 1.0), ("si_snr", 0.3)))
    clean = jnp.asarray(rng.standard_normal((2, 2000)) * 0.1, jnp.float32)
    noisy = clean + jnp.asarray(rng.standard_normal((2, 2000)) * 0.05, jnp.float32)
    feat = model.compress(jnp.abs(stft(noisy, scfg)))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), feat)
    step = jax.jit(make_train_step(model, cfg))
    losses = []
    for _ in range(6):
        state, m = step(state, {"noisy": noisy, "clean": clean})
        losses.append(float(m["loss_pmsqe"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
