"""On-device synthetic mixing: RIR reverb, SNR scaling, dBFS jitter, EQ.

Implements the *intended* tail of the reference's truncated `snr_mix`
(dataset/dataset.py:235-264 ends mid-function; the FullSubNet-style ending --
target-dBFS rescale + clipping guard -- is restored here) as a fully jitted,
`vmap`-able batch function. Convolutions ride the MXU/FFT; per-example
randomness comes from split `jax.random` keys, so the whole augmentation
pipeline fuses into the training step's input stage.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cruse_tpu.dsp.biquad import random_eq_chain


def fft_convolve(x: jax.Array, h: jax.Array, out_len: int | None = None) -> jax.Array:
    """Linear convolution along the last axis via rFFT (device-side
    `scipy.signal.fftconvolve` equivalent). x: [..., L], h: [..., R]."""
    n = x.shape[-1] + h.shape[-1] - 1
    nfft = 1 << (n - 1).bit_length()
    y = jnp.fft.irfft(
        jnp.fft.rfft(x, nfft) * jnp.fft.rfft(h, nfft), nfft
    )[..., :n]
    if out_len is not None:
        y = y[..., :out_len]
    return y


def add_reverb(clean: jax.Array, rir: jax.Array, predelay_ms: float = 50.0, sr: int = 16000):
    """Convolve clean speech with a RIR; also return the early-reflection
    target (RIR truncated `predelay` ms after the direct path), the common
    dereverberation training target (dataset/dataset.py:215-233).

    clean: [L], rir: [R]. Returns (reverberant [L], early_target [L]).
    """
    direct_idx = jnp.argmax(jnp.abs(rir))
    early_end = direct_idx + int(predelay_ms * sr / 1000.0)
    ramp = jnp.arange(rir.shape[-1])
    early_rir = jnp.where(ramp < early_end, rir, 0.0)
    reverberant = fft_convolve(clean, rir, out_len=clean.shape[-1])
    early = fft_convolve(clean, early_rir, out_len=clean.shape[-1])
    return reverberant, early


@dataclasses.dataclass(frozen=True)
class MixerConfig:
    sr: int = 16000
    snr_range: tuple = (-5, 20)
    target_db_fs: float = -25.0
    target_db_fs_floating: float = 10.0
    reverb_proportion: float = 0.0
    reverb_noise_proportion: float = 0.0
    predelay_ms: float = 50.0
    use_early_reverb_target: bool = True
    eq_proportion: float = 0.0  # random biquad chain on the noisy mix
    eq_filters: int = 3
    clip_threshold: float = 0.99
    eps: float = 1e-7


def _rms(x):
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))


def mix_components(key: jax.Array, clean: jax.Array, noise: jax.Array, cfg: MixerConfig,
                   rir: jax.Array | None = None, rir_noise: jax.Array | None = None):
    """The snr_mix pipeline up to (scaled clean, scaled noise, target) --
    noisy = clean_s + noise_s. Exposed so the multi-channel simulator can
    delay the components per mic before summing."""
    k_rev, k_revn, k_snr, k_dbfs, _, _ = jax.random.split(key, 6)
    eps = cfg.eps

    target = clean
    if rir is not None:
        reverberant, early = add_reverb(clean, rir, cfg.predelay_ms, cfg.sr)
        use_rev = jax.random.uniform(k_rev, ()) < cfg.reverb_proportion
        clean = jnp.where(use_rev, reverberant, clean)
        target = jnp.where(
            use_rev, early if cfg.use_early_reverb_target else reverberant, target
        )
    if rir_noise is not None:
        rev_noise = fft_convolve(noise, rir_noise, out_len=noise.shape[-1])
        use_rev_n = jax.random.uniform(k_revn, ()) < cfg.reverb_noise_proportion
        noise = jnp.where(use_rev_n, rev_noise, noise)

    # peak normalization (the target scales with the clean signal)
    clean_peak = jnp.max(jnp.abs(clean)) + eps
    clean = clean / clean_peak
    target = target / clean_peak
    noise = noise / (jnp.max(jnp.abs(noise)) + eps)

    snr = jax.random.randint(
        k_snr, (), cfg.snr_range[0], cfg.snr_range[1] + 1
    ).astype(jnp.float32)
    snr_scalar = _rms(clean)[..., 0] / (10.0 ** (snr / 20.0)) / (_rms(noise)[..., 0] + eps)
    noise = noise * snr_scalar
    noisy = clean + noise

    # random output level
    dbfs = jax.random.uniform(
        k_dbfs,
        (),
        minval=cfg.target_db_fs - cfg.target_db_fs_floating,
        maxval=cfg.target_db_fs + cfg.target_db_fs_floating,
    )
    scalar = 10.0 ** (dbfs / 20.0) / (_rms(noisy)[..., 0] + eps)
    noisy, target = noisy * scalar, target * scalar

    # clipping guard (restored FullSubNet-style ending)
    peak = jnp.max(jnp.abs(noisy))
    over = peak > cfg.clip_threshold
    fix = jnp.where(over, cfg.clip_threshold / (peak + eps), 1.0)
    return clean * scalar * fix, noise * scalar * fix, target * fix


def mix_single(key: jax.Array, clean: jax.Array, noise: jax.Array, cfg: MixerConfig,
               rir: jax.Array | None = None, rir_noise: jax.Array | None = None):
    """Mix one example: returns (noisy [L], clean_target [L]).

    Steps (snr_mix intent, dataset.py:235-264 + FullSubNet tail):
      1. optional reverb on clean (Bernoulli(reverb_proportion)); the training
         target stays the early-reflection signal when configured
      2. optional reverb on noise
      3. peak-normalize both; RMS-derived snr scalar; mix at SNR ~ U{range}
      4. random target dBFS in [target +- floating]
      5. clipping guard: rescale everything if |noisy| > threshold
      6. optional random EQ chain on the noisy signal
    """
    _, _, _, _, k_eq, k_equse = jax.random.split(key, 6)
    clean_s, noise_s, target = mix_components(key, clean, noise, cfg, rir, rir_noise)
    noisy = clean_s + noise_s

    if cfg.eq_proportion > 0:
        eq_noisy = random_eq_chain(k_eq, noisy[None], cfg.eq_filters, cfg.sr)[0]
        use_eq = jax.random.uniform(k_equse, ()) < cfg.eq_proportion
        noisy = jnp.where(use_eq, eq_noisy, noisy)

    return noisy, target


def fractional_delay(x: jax.Array, delay: jax.Array) -> jax.Array:
    """Delay x [..., L] by `delay` samples (fractional OK) via the rFFT
    phase ramp; zero-padded so nothing wraps around."""
    l = x.shape[-1]
    nfft = 1 << (l + 63).bit_length()  # headroom for the delay tail
    freqs = jnp.fft.rfftfreq(nfft)
    shift = jnp.exp(-2j * jnp.pi * freqs * delay)
    return jnp.fft.irfft(jnp.fft.rfft(x, nfft) * shift, nfft)[..., :l]


def mix_single_mc(key: jax.Array, clean: jax.Array, noise: jax.Array, cfg: MixerConfig,
                  num_mics: int, max_delay: float = 8.0, gain_jitter_db: float = 1.0):
    """Multi-channel mixture: (noisy [M, L], target [L]).

    Free-field far-field approximation: mic 0 is the reference (zero delay,
    unit gain); each other mic hears the clean and noise components with
    independent fractional delays ~ U[0, max_delay] samples and a small
    gain jitter -- enough spatial structure for IPD features to be
    informative. (A room-acoustics simulation with per-mic RIRs is the
    round-3 upgrade; the reference has no MC data path at all.)
    """
    k_mix, k_dc, k_dn, k_g = jax.random.split(key, 4)
    clean_s, noise_s, target = mix_components(k_mix, clean, noise, cfg)
    d_c = jax.random.uniform(k_dc, (num_mics,), minval=0.0, maxval=max_delay).at[0].set(0.0)
    d_n = jax.random.uniform(k_dn, (num_mics,), minval=0.0, maxval=max_delay).at[0].set(0.0)
    g_db = jax.random.uniform(
        k_g, (num_mics,), minval=-gain_jitter_db, maxval=gain_jitter_db
    ).at[0].set(0.0)
    g = 10.0 ** (g_db / 20.0)
    mics = jax.vmap(
        lambda dc, dn, gi: gi * (fractional_delay(clean_s, dc) + fractional_delay(noise_s, dn))
    )(d_c, d_n, g)
    return mics, target


def mix_batch_mc(key: jax.Array, clean: jax.Array, noise: jax.Array, cfg: MixerConfig,
                 num_mics: int, max_delay: float = 8.0, gain_jitter_db: float = 1.0):
    """vmap of mix_single_mc: clean/noise [B, L] -> (noisy [B, M, L], target
    [B, L])."""
    keys = jax.random.split(key, clean.shape[0])
    return jax.vmap(
        lambda k, c, n: mix_single_mc(k, c, n, cfg, num_mics, max_delay, gain_jitter_db)
    )(keys, clean, noise)


def mix_batch(key: jax.Array, clean: jax.Array, noise: jax.Array, cfg: MixerConfig,
              rir: jax.Array | None = None, rir_noise: jax.Array | None = None):
    """vmap of mix_single over the batch. clean/noise: [B, L]; rir(s): [B, R]
    (pad RIRs to a common static length; all-zero RIR rows are treated as
    "no reverb" by the Bernoulli draw upstream)."""
    keys = jax.random.split(key, clean.shape[0])
    if rir is None and rir_noise is None:
        return jax.vmap(lambda k, c, n: mix_single(k, c, n, cfg))(keys, clean, noise)
    if rir_noise is None:
        return jax.vmap(lambda k, c, n, r: mix_single(k, c, n, cfg, r))(keys, clean, noise, rir)
    if rir is None:
        return jax.vmap(lambda k, c, n, rn: mix_single(k, c, n, cfg, None, rn))(
            keys, clean, noise, rir_noise
        )
    return jax.vmap(lambda k, c, n, r, rn: mix_single(k, c, n, cfg, r, rn))(
        keys, clean, noise, rir, rir_noise
    )
