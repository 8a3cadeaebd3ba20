"""Spectral-domain losses.

Reproduces the *intended* behavior of loss_func/loss.py (repaired per
SURVEY.md §2.9: `torch.size` bugs, swapped phase terms in c_rmse) and the
multi-resolution spectral loss of test/test_loss.py:193-243.

Convention: complex spectra are [B, T, F] (time-major) or explicit
(real, imag) channel pairs [B, T, F, 2].
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from cruse_tpu.dsp.stft import StftConfig, stft
from cruse_tpu.dsp.features import frame_vad


@jax.custom_jvp
def stable_angle(real, imag):
    """atan2 with a zero-safe gradient (the reference builds a custom
    autograd Function for this, test/test_loss.py:204-243): at r -> 0 the
    true gradient blows up; clamp the squared radius in the backward."""
    return jnp.arctan2(imag, real)


@stable_angle.defjvp
def _stable_angle_jvp(primals, tangents):
    real, imag = primals
    dr, di = tangents
    r2 = jnp.maximum(real**2 + imag**2, 1e-10)
    primal = jnp.arctan2(imag, real)
    tangent = (-imag * dr + real * di) / r2
    return primal, tangent


def _split_ri(spec):
    """Accept complex [B, T, F] or stacked [B, T, F, 2]; return (re, im)."""
    if jnp.iscomplexobj(spec):
        return jnp.real(spec), jnp.imag(spec)
    assert spec.shape[-1] == 2
    return spec[..., 0], spec[..., 1]


def rmse_loss(est, ref) -> jax.Array:
    """Mean absolute error normalized by B*T*F (repaired loss.py:59-78:
    sum(sqrt(err^2)) == sum |err|)."""
    re_e, im_e = _split_ri(est)
    re_r, im_r = _split_ri(ref)
    err = jnp.abs(re_e - re_r) + jnp.abs(im_e - im_r)
    return jnp.sum(err) / err.size


def compressed_spectral_loss(
    est, ref, c: float = 0.3, beta: float = 0.3, eps: float = 1e-8
) -> jax.Array:
    """Power-law compressed magnitude + compressed-complex MSE blend
    (DCCRN/c_rmse intent, loss.py:88-118 with the phase assignment repaired:
    each compressed complex uses its OWN phase).

    loss = (1-beta) * sum((|S|^c - |Ŝ|^c)^2)
         + beta * sum(| |Ŝ|^c e^{jφ_ŝ} - |S|^c e^{jφ_s} |^2)
    """
    re_e, im_e = _split_ri(est)
    re_r, im_r = _split_ri(ref)
    mag_e = jnp.sqrt(re_e**2 + im_e**2 + eps)
    mag_r = jnp.sqrt(re_r**2 + im_r**2 + eps)
    comp_e = jnp.power(mag_e, c)
    comp_r = jnp.power(mag_r, c)
    # compressed complex spectra: scale unit-phase by compressed magnitude
    scale_e = comp_e / mag_e
    scale_r = comp_r / mag_r
    dr = scale_e * re_e - scale_r * re_r
    di = scale_e * im_e - scale_r * im_r
    loss_mag = jnp.sum(jnp.square(comp_r - comp_e))
    loss_cplx = jnp.sum(dr**2 + di**2)
    return (1.0 - beta) * loss_mag + beta * loss_cplx


def weighted_male_loss(
    est, ref, noisy, alpha: float = 2.0, beta: float = 1.0, gamma: float = 1.0, eps: float = 1e-8
) -> jax.Array:
    """WO-MALE: IAM-weighted mean absolute log-magnitude error
    (loss.py:121-148). Weight W = exp(alpha / (beta + IAM^gamma))."""
    re_e, im_e = _split_ri(est)
    re_r, im_r = _split_ri(ref)
    re_n, im_n = _split_ri(noisy)
    mag_e = jnp.sqrt(re_e**2 + im_e**2 + eps)
    mag_r = jnp.sqrt(re_r**2 + im_r**2 + eps)
    mag_n = jnp.sqrt(re_n**2 + im_n**2 + eps)
    iam = jnp.power(mag_r / (mag_n + eps), gamma)
    w = jnp.exp(alpha / (beta + iam))
    loss = w * jnp.abs(jnp.log10(mag_e + 1.0) - jnp.log10(mag_r + 1.0))
    return jnp.sum(loss) / loss.size


def sdnr_loss(
    clean_spec,
    gain,
    noise_spec,
    snr_db,
    beta_db: float = 20.0,
    vad_threshold_db: float = -60.0,
) -> jax.Array:
    """SNR-weighted speech-distortion + noise-suppression loss
    (loss.py:151-175; paper: "Weighted speech distortion losses for
    neural-network-based real-time speech enhancement").

    clean_spec/noise_spec: complex [B, T, F]; gain: [B, T, F] mask in [0,1];
    snr_db: per-utterance SNR [B].
    alpha = snr / (snr + beta) in linear power; L_speech on VAD-gated clean
    frames, L_noise on the suppressed noise energy.
    """
    clean_mag = jnp.abs(clean_spec)
    l_noise = jnp.mean(jnp.sum(jnp.square(jnp.abs(noise_spec) * gain), axis=(-2, -1)))
    vad = frame_vad(clean_mag, vad_threshold_db)  # [B, T, 1]
    s_sa = vad * clean_mag
    l_speech = jnp.mean(jnp.sum(jnp.square(s_sa - gain * s_sa), axis=(-2, -1)))
    snr_lin = 10.0 ** (snr_db / 10.0)
    beta_lin = 10.0 ** (beta_db / 10.0)
    alpha = jnp.mean(snr_lin / (snr_lin + beta_lin))
    return alpha * l_speech + (1.0 - alpha) * l_noise


@dataclasses.dataclass(frozen=True)
class MultiResSpectralConfig:
    n_ffts: Tuple[int, ...] = (512, 1024, 2048)
    gamma: float = 0.3  # magnitude compression
    factor_magnitude: float = 1.0
    factor_complex: float = 1.0


def multi_res_spectral_loss(
    est_wav: jax.Array, ref_wav: jax.Array, cfg: MultiResSpectralConfig = MultiResSpectralConfig()
) -> jax.Array:
    """Multi-resolution compressed spectral loss (test/test_loss.py:193-243):
    for each FFT size, MSE on |X|^gamma plus MSE on |X|^gamma * e^{j angle}
    (complex term), normalized hann windows (hop = n_fft/4)."""
    total = 0.0
    for n_fft in cfg.n_ffts:
        scfg = StftConfig(n_fft=n_fft, hop_length=n_fft // 4)
        s_e = stft(est_wav, scfg)
        s_r = stft(ref_wav, scfg)
        mag_e = jnp.abs(s_e)
        mag_r = jnp.abs(s_r)
        comp_e = jnp.power(mag_e + 1e-12, cfg.gamma)
        comp_r = jnp.power(mag_r + 1e-12, cfg.gamma)
        total = total + cfg.factor_magnitude * jnp.mean(jnp.square(comp_e - comp_r))
        if cfg.factor_complex > 0:
            scale_e = comp_e / (mag_e + 1e-12)
            scale_r = comp_r / (mag_r + 1e-12)
            d = scale_e * s_e - scale_r * s_r
            total = total + cfg.factor_complex * jnp.mean(jnp.square(jnp.abs(d)))
    return total


def cirm_mse_loss(enhanced_ri, noisy_ri, clean_ri) -> jax.Array:
    """FullSubNet-recipe objective: MSE between compressed cIRMs.

    The predicted mask is recovered from the enhanced spectrum by the same
    conjugate division the ideal-mask builder uses (enhanced / noisy), so a
    model that predicts cIRM internally (models/fullsubnet.py through its
    adapter) round-trips exactly, while any spectrum-emitting model can
    also train against it. Reference lineage: the cIRM build/compress pair
    (/root/reference/train_base/acoustics/mask.py:23-51) is exactly the
    FullSubNet upstream's training target; the reference ships the masks
    but no consumer loss.

    enhanced_ri/noisy_ri/clean_ri: [..., F, 2] RI spectra. Returns the
    mean squared error over compressed mask components (bounded (-10, 10)).
    """
    from cruse_tpu.dsp.mask import build_complex_ideal_ratio_mask, compress_cirm

    eps = 1e-8
    nr, ni = noisy_ri[..., 0], noisy_ri[..., 1]
    er, ei = enhanced_ri[..., 0], enhanced_ri[..., 1]
    denom = jnp.square(nr) + jnp.square(ni) + eps
    pred_r = compress_cirm((nr * er + ni * ei) / denom)
    pred_i = compress_cirm((nr * ei - ni * er) / denom)
    ideal_r, ideal_i = build_complex_ideal_ratio_mask(
        jax.lax.complex(nr, ni), jax.lax.complex(clean_ri[..., 0], clean_ri[..., 1])
    )
    return jnp.mean(jnp.square(pred_r - ideal_r) + jnp.square(pred_i - ideal_i))
