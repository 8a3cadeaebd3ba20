"""Level/activity utilities, sampling helpers, sub-band tricks.

numpy variants (host-side data prep) live alongside jnp variants (device,
jittable). Behaviors mirror train_base/acoustics/feature.py:92-269 and the
VAD/RMS utilities in utils/utils.py:59-214.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------- level utilities ---------------------------


def norm_amplitude(y, scalar=None, eps=1e-6):
    """Peak-normalize; returns (normed, scalar). Host (numpy) variant."""
    if scalar is None:
        scalar = np.max(np.abs(y)) + eps
    return y / scalar, scalar


def tailor_db_fs(y, target_db_fs=-25.0, eps=1e-6):
    """RMS-rescale to a target dBFS; returns (y, rms, scalar)."""
    xp = jnp if isinstance(y, jax.Array) else np
    rms = xp.sqrt(xp.mean(y**2))
    scalar = 10.0 ** (target_db_fs / 20.0) / (rms + eps)
    return y * scalar, rms, scalar


def is_clipped(y, clipping_threshold=0.999):
    xp = jnp if isinstance(y, jax.Array) else np
    return xp.any(xp.abs(y) > clipping_threshold)


def active_rms(clean, noise, sr=16000, energy_threshold=-50.0, window_ms=100):
    """RMS over active (above-threshold) windows, both signals gated by the
    clean signal's activity (utils/utils.py:59-103 intent). numpy, host-side."""
    window_samples = int(sr * window_ms / 1000)
    eps = 1e-10
    num_win = len(clean) // window_samples
    clean_w = clean[: num_win * window_samples].reshape(num_win, window_samples)
    noise_w = noise[: num_win * window_samples].reshape(num_win, window_samples)
    win_db = 20 * np.log10(np.sqrt(np.mean(clean_w**2, axis=1)) + eps)
    active = win_db > energy_threshold
    if not active.any():
        return np.sqrt(np.mean(clean**2)), np.sqrt(np.mean(noise**2))
    c_rms = np.sqrt(np.mean(clean_w[active] ** 2))
    n_rms = np.sqrt(np.mean(noise_w[active] ** 2))
    return c_rms, n_rms


# ------------------------------- VAD -----------------------------------


def activity_detector(audio, fs=16000, activity_threshold=0.13, target_level=-25.0, eps=1e-6):
    """Fraction of 50 ms windows whose smoothed energy prob exceeds threshold
    (feature.py:194-236). Host-side numpy; vectorized, no sample loop."""
    audio, _, _ = tailor_db_fs(np.asarray(audio, np.float64), target_level)
    window_samples = int(fs * 50 / 1000)
    n_win = int(np.ceil(len(audio) / window_samples))
    padded = np.zeros(n_win * window_samples)
    padded[: len(audio)] = audio
    frames = padded.reshape(n_win, window_samples)
    frame_rms = 20 * np.log10(np.sum(frames**2, axis=1) + eps)
    prob = 1.0 / (1.0 + np.exp(-(-1.0 + 0.2 * frame_rms)))
    # attack/release smoothing against the *previous raw* prob (reference quirk)
    alpha_att, alpha_rel = 0.8, 0.05
    prev = np.concatenate([[0.0], prob[:-1]])
    attack = prob > prev
    smoothed = np.where(
        attack,
        prob * alpha_att + prev * (1 - alpha_att),
        prob * alpha_rel + prev * (1 - alpha_rel),
    )
    return float(np.mean(smoothed > activity_threshold))


def amplitude_vad(y, sr=16000, frame_ms=20, threshold_db=-45.0, hangover_frames=4):
    """RNNoise-style per-frame amplitude VAD with hangover
    (utils/utils.py:186-214 intent, completed). Host numpy; returns a
    per-frame {0,1} array."""
    y = np.asarray(y, np.float64)
    n = int(sr * frame_ms / 1000)
    num = len(y) // n
    frames = y[: num * n].reshape(num, n)
    db = 20 * np.log10(np.sqrt(np.mean(frames**2, axis=1)) + 1e-12)
    raw = db > threshold_db
    vad = raw.copy()
    hang = 0
    for i in range(num):
        if raw[i]:
            hang = hangover_frames
        elif hang > 0:
            vad[i] = True
            hang -= 1
    return vad.astype(np.float32)


def spectral_band_vad(y, sr=16000, n_fft=320, hop=160, band_hz=(300.0, 5000.0),
                      threshold_db=-50.0):
    """Speech-band energy VAD (the `vad_simplify` demo, utils/utils.py:106-140):
    per-frame energy restricted to the speech band vs the utterance peak."""
    y = np.asarray(y, np.float64)
    frames = np.lib.stride_tricks.sliding_window_view(y, n_fft)[::hop]
    mag2 = np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=1)) ** 2
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    band = (freqs >= band_hz[0]) & (freqs <= band_hz[1])
    energy = mag2[:, band].sum(axis=1)
    db = 10 * np.log10(energy / (energy.max() + 1e-12) + 1e-12)
    return (db > threshold_db).astype(np.float32)


def vad_statistics(vad_flags) -> dict:
    """Corpus activity statistics (`statist_vad` intent, with the
    string-counting bug fixed: count actual active flags)."""
    flags = np.asarray(vad_flags, np.float64)
    return {
        "frames": int(flags.size),
        "active_fraction": float(flags.mean()) if flags.size else 0.0,
    }


def frame_vad(mag, threshold_db=-60.0):
    """Per-frame binary VAD from a magnitude spectrogram [..., T, F] (device).

    Equivalent of `activity_detector_tf_frame` used by the SDNR loss
    (utils/utils.py:143-183): frame is active if its energy is within
    `threshold_db` of the utterance peak frame.
    """
    frame_energy = jnp.sum(jnp.square(mag), axis=-1)  # [..., T]
    peak = jnp.max(frame_energy, axis=-1, keepdims=True)
    db = 10.0 * jnp.log10(frame_energy / (peak + 1e-12) + 1e-12)
    return (db > threshold_db).astype(mag.dtype)[..., None]  # [..., T, 1]


# --------------------------- sampling utilities ---------------------------


def subsample(data, sub_sample_length, rng=None, start_position=-1, return_start_position=False):
    """Random fixed-length crop (pad with zeros when short). numpy, 1-D."""
    assert np.ndim(data) == 1
    length = len(data)
    rng = rng or np.random.default_rng()
    if length > sub_sample_length:
        if start_position < 0:
            start_position = int(rng.integers(0, length - sub_sample_length))
        data = data[start_position : start_position + sub_sample_length]
    elif length < sub_sample_length:
        data = np.append(data, np.zeros(sub_sample_length - length, dtype=data.dtype))
    if return_start_position:
        return data, start_position
    return data


def aligned_subsample(data_a, data_b, sub_sample_length, rng=None):
    """Paired random crop/pad along the last axis (feature.py:117-140)."""
    assert data_a.shape[-1] == data_b.shape[-1]
    rng = rng or np.random.default_rng()
    length = data_a.shape[-1]
    if length > sub_sample_length:
        start = int(rng.integers(0, length - sub_sample_length + 1))
        sl = (..., slice(start, start + sub_sample_length))
        return data_a[sl], data_b[sl]
    if length < sub_sample_length:
        pad_width = [(0, 0)] * (data_a.ndim - 1) + [(0, sub_sample_length - length)]
        return (
            np.pad(data_a, pad_width, mode="constant"),
            np.pad(data_b, pad_width, mode="constant"),
        )
    return data_a, data_b


def overlap_cat(chunk_list, axis=-1):
    """Stitch 50%-overlapping chunks, averaging the shared halves
    (feature.py:172-191). Device (jnp) variant."""
    pieces = []
    for i, chunk in enumerate(chunk_list):
        half = chunk.shape[axis] // 2
        first = jax.lax.slice_in_dim(chunk, 0, half, axis=axis)
        last = jax.lax.slice_in_dim(chunk, half, chunk.shape[axis], axis=axis)
        if i == 0:
            pieces += [first, last]
        else:
            pieces[-1] = (pieces[-1] + first) / 2.0
            pieces.append(last)
    return jnp.concatenate(pieces, axis=axis)


def drop_band(x, num_groups=2):
    """FullSubNet frequency-subsample trick (feature.py:239-269).

    x: [B, C, F, T] -> [B, C, F // num_groups, T], rotating freq offsets
    across batch groups.
    """
    batch_size, _, num_freqs, _ = x.shape
    assert batch_size > num_groups
    if num_groups <= 1:
        return x
    if num_freqs % num_groups != 0:
        x = x[..., : num_freqs - (num_freqs % num_groups), :]
    out = []
    for g in range(num_groups):
        samples = jnp.arange(g, batch_size, num_groups)
        freqs = jnp.arange(g, x.shape[2], num_groups)
        out.append(x[samples][:, :, freqs, :])
    return jnp.concatenate(out, axis=0)


# ----------------------- multi-channel features -----------------------


def log_power_spectrum(mag, eps=1e-8):
    return jnp.log(jnp.square(mag) + eps)


def channelwise_layer_norm(x, scale=None, bias=None, eps=1e-5, axis=-1):
    """LayerNorm over the channel axis per (batch, time) position
    (feature.py:401-420 ChannelWiseLayerNorm)."""
    mu = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=axis, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y


def directional_features_from_ri(ri, mic_pairs, lps_channel=0, use_sin_ipd=False,
                                 eps=1e-8):
    """Directional features straight from a multi-channel RI spectrum.

    ri: [B, M, T, F, 2] -> [B, T, F + P*F(, +P*F)] (normalized LPS of the
    reference channel + cos(/sin) IPD per mic pair). Same math as
    DirectionalFeatureComputer but starting from the spectrum, so the
    training adapter (which already holds noisy_ri) can reuse it without a
    second STFT."""
    real, imag = ri[..., 0], ri[..., 1]
    mag = jnp.sqrt(real**2 + imag**2 + eps)
    phase = jnp.arctan2(imag, real)
    lps = channelwise_layer_norm(log_power_spectrum(mag[:, lps_channel], eps), axis=-1)
    ipds = ipd_features(phase, mic_pairs, use_sin=use_sin_ipd)  # [B, P(,2P), T, F]
    b, p, t, f = ipds.shape
    return jnp.concatenate(
        [lps, ipds.transpose(0, 2, 1, 3).reshape(b, t, p * f)], axis=-1
    )


class DirectionalFeatureComputer:
    """Multi-channel spatial feature front-end: LPS of a reference channel +
    cos/sin IPD over mic pairs (feature.py:423-611 behavior, time-major).

    Call with multi-channel waveforms [B, M, L]; returns
    (features [B, T, D], magnitude, phase, real, imag) where D stacks the
    normalized LPS (F) and each pair's IPD (P*F, + P*F when sin enabled).
    `channel_stacked=True` instead returns [B, 1+P(, +P), T, F] channel-major
    features (the ChannelDirectionalFeatureComputer variant).
    """

    def __init__(self, stft_config, mic_pairs, lps_channel=0, use_cos_ipd=True,
                 use_sin_ipd=False, channel_stacked=False, eps=1e-8):
        from cruse_tpu.dsp.stft import StftConfig  # noqa: F401 (type)

        self.cfg = stft_config
        self.mic_pairs = list(mic_pairs)
        self.lps_channel = lps_channel
        self.use_cos_ipd = use_cos_ipd
        self.use_sin_ipd = use_sin_ipd
        self.channel_stacked = channel_stacked
        self.eps = eps

    @property
    def directional_feature_dim(self):
        f = self.cfg.num_bins
        if self.channel_stacked:
            d = 1 + len(self.mic_pairs) * (1 + int(self.use_sin_ipd))
        else:
            d = f + len(self.mic_pairs) * f * (1 + int(self.use_sin_ipd))
        return d

    def __call__(self, y):
        from cruse_tpu.dsp.stft import mc_stft

        assert y.ndim == 3, f"[B, M, L] expected, got {y.shape}"
        spec = mc_stft(y, self.cfg)  # [B, M, T, F]
        real, imag = jnp.real(spec), jnp.imag(spec)
        mag = jnp.sqrt(real**2 + imag**2 + self.eps)
        phase = jnp.arctan2(imag, real)

        lps = log_power_spectrum(mag[:, self.lps_channel], self.eps)  # [B, T, F]
        ipds = ipd_features(phase, self.mic_pairs, use_sin=self.use_sin_ipd)  # [B, P(,2P), T, F]

        if self.channel_stacked:
            feats = jnp.concatenate([lps[:, None], ipds], axis=1)
        else:
            lps_n = channelwise_layer_norm(lps, axis=-1)
            b, p, t, f = ipds.shape
            feats = jnp.concatenate(
                [lps_n, ipds.transpose(0, 2, 1, 3).reshape(b, t, p * f)], axis=-1
            )
        return feats, mag, phase, real, imag


def ipd_features(phase, mic_pairs, use_sin=False):
    """cos/sin inter-phase differences over mic pairs.

    phase: [B, M, T, F]; returns [B, P(, 2P), T, F] stacked features
    (feature.py:464-473 semantics, time-major layout).
    """
    left = jnp.asarray([p[0] for p in mic_pairs])
    right = jnp.asarray([p[1] for p in mic_pairs])
    diff = phase[:, left] - phase[:, right]
    feats = [jnp.cos(diff)]
    if use_sin:
        feats.append(jnp.sin(diff))
    return jnp.concatenate(feats, axis=1)
