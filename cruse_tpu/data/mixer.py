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


# ---------------- image-source room simulator (multi-mic) ----------------


@dataclasses.dataclass(frozen=True)
class RoomConfig:
    """Randomized shoebox rooms for the multi-mic path (reference lineage:
    the reference computes directional features, feature.py:423-611, but has
    no MC data simulation at all; the free-field delay model above was the
    round-2 stand-in). Image-source model (Allen & Berkley) up to
    `max_order` reflections per axis, synthesized exactly in the frequency
    domain (fractional delays = phase ramps, so IPDs are physically
    consistent across mics), plus an optional stochastic decorrelated late
    tail matched to the drawn T60 (hybrid ISM-early + diffuse-late)."""

    sr: int = 16000
    room_lx: tuple = (4.0, 8.0)
    room_ly: tuple = (3.0, 6.0)
    room_lz: tuple = (2.4, 3.5)
    t60: tuple = (0.2, 0.6)
    max_order: int = 1  # images per axis: 2*(2*order+1); order 1 -> 216 total
    mic_spacing: float = 0.05  # linear array along x, centered in the room
    array_geometry: str = "linear"  # "linear" | "circular" | "custom"
    array_radius: float = 0.05  # circular array radius (xy-plane), meters
    mic_positions: tuple = ()  # custom: ((x, y, z), ...) offsets from the
    # array center, meters; length must equal num_mics
    rir_seconds: float = 0.4
    late_tail: bool = True
    c: float = 343.0


def _array_offsets(num_mics: int, room: RoomConfig) -> jnp.ndarray:
    """Mic offsets [M, 3] from the array center for the configured geometry.
    Linear: along x at `mic_spacing`. Circular: evenly spaced on a circle of
    `array_radius` in the xy-plane (mic 0 at azimuth 0). Custom: the literal
    `mic_positions` table."""
    if room.array_geometry == "linear":
        offs = (jnp.arange(num_mics) - (num_mics - 1) / 2.0) * room.mic_spacing
        return jnp.stack([offs, jnp.zeros_like(offs), jnp.zeros_like(offs)], axis=-1)
    if room.array_geometry == "circular":
        az = 2.0 * jnp.pi * jnp.arange(num_mics) / num_mics
        return jnp.stack(
            [room.array_radius * jnp.cos(az), room.array_radius * jnp.sin(az),
             jnp.zeros_like(az)], axis=-1)
    if room.array_geometry == "custom":
        pos = jnp.asarray(room.mic_positions, jnp.float32)
        assert pos.shape == (num_mics, 3), (
            f"mic_positions must be [{num_mics}, 3] (x, y, z) offsets, got "
            f"{pos.shape}")
        return pos
    raise ValueError(f"unknown array_geometry {room.array_geometry!r}")


def _sample_shoebox(key, num_mics: int, room: RoomConfig):
    """Random room + source/array geometry. Returns (image positions
    [Ni, 3], per-image amplitudes [Ni], mic positions [M, 3], T60)."""
    kl, ks, ka, kt = jax.random.split(key, 4)
    lo = jnp.array([room.room_lx[0], room.room_ly[0], room.room_lz[0]])
    hi = jnp.array([room.room_lx[1], room.room_ly[1], room.room_lz[1]])
    dims = jax.random.uniform(kl, (3,), minval=lo, maxval=hi)
    # source somewhere in the room interior (0.5 m off the walls):
    # u in [0, 1) scaled to the interior span gives [0.5, dims - 0.5)
    src = jax.random.uniform(ks, (3,)) * (dims - 1.0) + 0.5
    # the configured array geometry at a random interior point
    center = jax.random.uniform(ka, (3,)) * (dims - 1.0) + 0.5
    mics = center[None, :] + _array_offsets(num_mics, room)
    t60 = jax.random.uniform(kt, (), minval=room.t60[0], maxval=room.t60[1])
    # Sabine -> uniform wall energy absorption -> reflection coefficient
    vol = jnp.prod(dims)
    surf = 2.0 * (dims[0] * dims[1] + dims[0] * dims[2] + dims[1] * dims[2])
    absorption = jnp.clip(0.161 * vol / (surf * t60), 0.01, 0.99)
    beta = jnp.sqrt(1.0 - absorption)

    n = room.max_order
    qs = jnp.arange(-n, n + 1)  # wall-pair index
    # Allen-Berkley image set per axis: eps*src + 2*q*L, reflection count
    # |2q| (eps=+1) or |2q-1| (eps=-1)
    q_grid = jnp.repeat(qs, 2)  # [2(2n+1)]
    eps_grid = jnp.tile(jnp.array([1.0, -1.0]), 2 * n + 1)
    refl_grid = jnp.where(eps_grid > 0, jnp.abs(2 * q_grid), jnp.abs(2 * q_grid - 1))

    def axis_images(s, l):
        return eps_grid * s + 2.0 * q_grid.astype(jnp.float32) * l

    ax = [axis_images(src[i], dims[i]) for i in range(3)]
    na = ax[0].shape[0]
    ii, jj, kk = jnp.meshgrid(jnp.arange(na), jnp.arange(na), jnp.arange(na),
                              indexing="ij")
    ii, jj, kk = ii.ravel(), jj.ravel(), kk.ravel()
    pos = jnp.stack([ax[0][ii], ax[1][jj], ax[2][kk]], axis=-1)  # [Ni, 3]
    n_refl = refl_grid[ii] + refl_grid[jj] + refl_grid[kk]
    amps = beta**n_refl
    return pos, amps, mics, t60


def room_transfers(key, num_mics: int, nfft: int, room: RoomConfig,
                   early_ms: float = 50.0):
    """Per-mic transfer functions for one source: (H [M, F], H_early [F] for
    mic 0, T60). Exact fractional delays via rFFT phase ramps; images summed
    in chunks to bound memory. Amplitudes follow 1/(4 pi d) spreading."""
    k_geo, k_tail = jax.random.split(key)
    pos, amps, mics, t60 = _sample_shoebox(k_geo, num_mics, room)
    sr, c = room.sr, room.c
    freqs = jnp.fft.rfftfreq(nfft)  # cycles/sample
    dist = jnp.linalg.norm(pos[:, None, :] - mics[None, :, :], axis=-1)  # [Ni, M]
    delay = dist / c * sr  # samples
    gain = amps[:, None] / (4.0 * jnp.pi * jnp.maximum(dist, 0.1))  # [Ni, M]
    direct_delay = delay[jnp.argmin(dist[:, 0]), 0]
    early_cut = direct_delay + early_ms * sr / 1000.0

    def chunk_sum(carry, idx):
        h, h_early = carry
        d = jax.lax.dynamic_slice_in_dim(delay, idx, CH, axis=0)  # [CH, M]
        g = jax.lax.dynamic_slice_in_dim(gain, idx, CH, axis=0)
        ph = jnp.exp(-2j * jnp.pi * freqs[None, None, :] * d[:, :, None])
        h = h + jnp.sum(g[:, :, None] * ph, axis=0)
        is_early = (d[:, 0] <= early_cut).astype(jnp.float32)
        h_early = h_early + jnp.sum(
            (g[:, 0] * is_early)[:, None] * ph[:, 0, :], axis=0
        )
        return (h, h_early), None

    ni = delay.shape[0]
    CH = 24
    pad = (-ni) % CH
    delay = jnp.pad(delay, ((0, pad), (0, 0)), constant_values=1e9)  # huge delay
    gain = jnp.pad(gain, ((0, pad), (0, 0)))  # zero gain -> no contribution
    (h, h_early), _ = jax.lax.scan(
        chunk_sum,
        (jnp.zeros((num_mics, freqs.shape[0]), jnp.complex64),
         jnp.zeros((freqs.shape[0],), jnp.complex64)),
        jnp.arange(0, ni + pad, CH),
    )

    if room.late_tail:
        # decorrelated gaussian tail per mic, exp decay at the drawn T60,
        # starting after the last ISM image could land; energy matched to a
        # continuation of the image series
        r_len = int(room.rir_seconds * sr)
        t = jnp.arange(r_len) / sr
        start = direct_delay / sr + 0.012 * (2 * room.max_order + 1)
        env = jnp.exp(-6.908 * jnp.maximum(t - start, 0.0) / t60) * (t >= start)
        mean_gain = jnp.mean(gain[: ni]) if ni else 0.0
        tails = mean_gain * env[None, :] * jax.random.normal(
            k_tail, (num_mics, r_len)
        )
        h = h + jnp.fft.rfft(tails, nfft)
    return h, h_early, t60


def _finish_mc_mix(k_snr, k_dbfs, rev_c, rev_n, target, cfg: MixerConfig):
    """Shared multi-mic mixing tail: SNR set at the reference mic after
    propagation, random output dBFS, clipping guard (the snr_mix ending,
    dataset/dataset.py:251-264 intent). rev_c/rev_n: [M, L], target: [L]."""
    eps = cfg.eps
    snr = jax.random.randint(
        k_snr, (), cfg.snr_range[0], cfg.snr_range[1] + 1
    ).astype(jnp.float32)
    snr_scalar = _rms(rev_c[0])[..., 0] / (10.0 ** (snr / 20.0)) / (
        _rms(rev_n[0])[..., 0] + eps
    )
    noisy = rev_c + rev_n * snr_scalar

    dbfs = jax.random.uniform(
        k_dbfs, (),
        minval=cfg.target_db_fs - cfg.target_db_fs_floating,
        maxval=cfg.target_db_fs + cfg.target_db_fs_floating,
    )
    scalar = 10.0 ** (dbfs / 20.0) / (_rms(noisy[0])[..., 0] + eps)
    noisy, target = noisy * scalar, target * scalar
    peak = jnp.max(jnp.abs(noisy))
    over = peak > cfg.clip_threshold
    fix = jnp.where(over, cfg.clip_threshold / (peak + eps), 1.0)
    return noisy * fix, target * fix


def mix_single_mc_room(key, clean, noise, cfg: MixerConfig, room: RoomConfig,
                       num_mics: int):
    """Reverberant multi-mic mixture via the image-source model:
    (noisy [M, L], target [L]).

    Speech and noise are separate sources in the SAME room (independent
    positions), so inter-mic phase differences carry true spatial structure.
    The target is the early-reflection (direct + `predelay_ms`) speech at
    the reference mic; SNR is set at the reference mic after propagation."""
    l = clean.shape[-1]
    nfft = 1 << (l + int(room.rir_seconds * room.sr) - 1).bit_length()
    k_rc, k_rn, k_snr, k_dbfs = jax.random.split(key, 4)
    eps = cfg.eps
    clean = clean / (jnp.max(jnp.abs(clean)) + eps)
    noise = noise / (jnp.max(jnp.abs(noise)) + eps)

    h_c, h_c_early, _ = room_transfers(k_rc, num_mics, nfft, room, cfg.predelay_ms)
    h_n, _, _ = room_transfers(k_rn, num_mics, nfft, room, cfg.predelay_ms)
    spec_c = jnp.fft.rfft(clean, nfft)
    spec_n = jnp.fft.rfft(noise, nfft)
    rev_c = jnp.fft.irfft(spec_c[None, :] * h_c, nfft)[:, :l]  # [M, L]
    rev_n = jnp.fft.irfft(spec_n[None, :] * h_n, nfft)[:, :l]
    target = jnp.fft.irfft(spec_c * h_c_early, nfft)[:l]
    if not cfg.use_early_reverb_target:
        target = rev_c[0]
    return _finish_mc_mix(k_snr, k_dbfs, rev_c, rev_n, target, cfg)


def mix_single_mc_rir(key, clean, noise, cfg: MixerConfig,
                      rir_c: jax.Array, rir_n: jax.Array):
    """Reverberant multi-mic mixture from MEASURED array RIRs:
    (noisy [M, L], target [L]).

    rir_c / rir_n: [M, R] multichannel impulse responses (one channel per
    mic) for the speech and noise source positions -- typically two entries
    of a measured-RIR corpus recorded with the same array. The target is the
    early part (direct + `predelay_ms`) of the speech RIR at the reference
    mic 0, matching the simulated paths; SNR is set at the reference mic
    after propagation. Reference lineage: dataset/dataset.py:205-233 draws
    single-channel RIR files; this is the array generalization the
    directional-feature models (feature.py:423-611) imply but the reference
    never ships a data path for."""
    l = clean.shape[-1]
    k_snr, k_dbfs = jax.random.split(key)
    eps = cfg.eps
    clean = clean / (jnp.max(jnp.abs(clean)) + eps)
    noise = noise / (jnp.max(jnp.abs(noise)) + eps)

    rev_c = fft_convolve(clean[None, :], rir_c, out_len=l)  # [M, L]
    rev_n = fft_convolve(noise[None, :], rir_n, out_len=l)
    if cfg.use_early_reverb_target:
        ref = rir_c[0]
        direct_idx = jnp.argmax(jnp.abs(ref))
        early_end = direct_idx + int(cfg.predelay_ms * cfg.sr / 1000.0)
        early_rir = jnp.where(jnp.arange(ref.shape[-1]) < early_end, ref, 0.0)
        target = fft_convolve(clean, early_rir, out_len=l)
    else:
        target = rev_c[0]
    return _finish_mc_mix(k_snr, k_dbfs, rev_c, rev_n, target, cfg)


def mix_batch_mc_rir(key, clean, noise, cfg: MixerConfig,
                     rir_c: jax.Array, rir_n: jax.Array):
    """vmap of mix_single_mc_rir: clean/noise [B, L], rir_c/rir_n [B, M, R]
    -> ([B, M, L], [B, L])."""
    keys = jax.random.split(key, clean.shape[0])
    return jax.vmap(
        lambda k, c, n, rc, rn: mix_single_mc_rir(k, c, n, cfg, rc, rn)
    )(keys, clean, noise, rir_c, rir_n)


def mix_batch_mc_room(key, clean, noise, cfg: MixerConfig, room: RoomConfig,
                      num_mics: int):
    """vmap of mix_single_mc_room: clean/noise [B, L] -> ([B, M, L], [B, L]);
    every example draws its own room, geometry, and T60."""
    keys = jax.random.split(key, clean.shape[0])
    return jax.vmap(
        lambda k, c, n: mix_single_mc_room(k, c, n, cfg, room, num_mics)
    )(keys, clean, noise)
