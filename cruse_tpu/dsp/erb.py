"""ERB-scale band analysis/synthesis as precomputed matrices (TPU-native).

Band widths are allocated with the same integer ERB-partition algorithm as the
reference (model/based_model/cust_conv.py:210-247), at trace time in numpy;
the resulting rectangular filterbank is applied as a single einsum (MXU) both
ways (cust_conv.py:187-207 semantics, including normalization options).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

_ERB_SCALE = 9.265
_ERB_MIN_BW = 24.7


def freq2erb(freq_hz):
    """Hz -> ERB scale (works on numpy or jax arrays)."""
    return _ERB_SCALE * np.log1p(np.asarray(freq_hz, dtype=np.float64) / (_ERB_MIN_BW * _ERB_SCALE))


def erb2freq(n_erb):
    """ERB scale -> Hz."""
    return _ERB_MIN_BW * _ERB_SCALE * (np.exp(np.asarray(n_erb, dtype=np.float64) / _ERB_SCALE) - 1.0)


@functools.lru_cache(maxsize=None)
def erb_widths(sr: int, fft_size: int, nb_bands: int, min_nb_freqs: int) -> tuple:
    """Allocate integer FFT-bin widths per ERB band.

    Equal steps on the ERB scale, each band floored to ``min_nb_freqs`` bins
    (borrowing from the following band), last band absorbs the remainder so
    the total is exactly ``fft_size // 2 + 1``.
    Reference behavior: cust_conv.py:218-247.
    """
    nyq = sr / 2
    freq_width = sr / fft_size
    erb_low = freq2erb(0.0)
    erb_high = freq2erb(nyq)
    step = (erb_high - erb_low) / nb_bands
    widths = np.zeros(nb_bands, dtype=np.int64)
    prev_freq = 0
    freq_over = 0
    for i in range(nb_bands):
        f = erb2freq(erb_low + (i + 1) * step)
        fb = int(np.round(f / freq_width))
        nb_freqs = fb - prev_freq - freq_over
        if nb_freqs < min_nb_freqs:
            freq_over = min_nb_freqs - nb_freqs
            nb_freqs = min_nb_freqs
        else:
            freq_over = 0
        widths[i] = nb_freqs
        prev_freq = fb
    widths[-1] += 1
    too_large = widths.sum() - (fft_size // 2 + 1)
    if too_large > 0:
        widths[-1] -= too_large
    assert widths.sum() == fft_size // 2 + 1, (widths.sum(), fft_size // 2 + 1)
    return tuple(int(w) for w in widths)


@functools.lru_cache(maxsize=None)
def erb_filterbank(
    widths: tuple, normalized: bool = True, inverse: bool = False
) -> np.ndarray:
    """Rectangular band matrix: [F, B] for analysis, [B, F] for synthesis.

    Analysis (``inverse=False``): each column selects its band's bins;
    ``normalized`` divides by band width (mean pooling).
    Synthesis (``inverse=True``): transpose; when *not* normalized, rows are
    divided by band width. Matches cust_conv.py:187-207.
    """
    widths_np = np.asarray(widths, dtype=np.int64)
    n_freqs = int(widths_np.sum())
    starts = np.cumsum(np.concatenate([[0], widths_np]))[:-1]
    fb = np.zeros((n_freqs, len(widths_np)), dtype=np.float32)
    for i, (b, w) in enumerate(zip(starts, widths_np)):
        fb[b : b + w, i] = 1.0
    if inverse:
        fb = fb.T
        if not normalized:
            fb = fb / fb.sum(axis=1, keepdims=True)
    else:
        if normalized:
            fb = fb / fb.sum(axis=0)
    return fb


def apply_erb(x, fb):
    """Band-pool a [..., F] power/mag array: [..., F] @ [F, B] -> [..., B]."""
    return jnp.matmul(x, jnp.asarray(fb))


def inverse_erb(xb, fb_inv):
    """Expand bands back to bins: [..., B] @ [B, F] -> [..., F]."""
    return jnp.matmul(xb, jnp.asarray(fb_inv))


# ---- per-band feature ops (reference workbench: test/test_erb.py:73-159) ----


def compute_band_corr(spec_a, spec_b, widths: tuple, normalized: bool = True):
    """Per-band correlation Re<a, conj(b)> pooled by the ERB matrix.

    spec_*: complex [..., F]. Returns [..., B].
    """
    fb = jnp.asarray(erb_filterbank(widths, normalized=normalized))
    corr = jnp.real(spec_a) * jnp.real(spec_b) + jnp.imag(spec_a) * jnp.imag(spec_b)
    return jnp.matmul(corr, fb)


def band_mean_norm_erb(xb, state, alpha: float, denominator: float = 40.0):
    """EMA mean-normalize band features (DeepFilterNet-style).

    xb: [B] (single frame) or scanned outside; state: running mean [B].
    Returns (normed, new_state).
    """
    state = xb * (1.0 - alpha) + state * alpha
    return (xb - state) / denominator, state


def band_unit_norm(xb_mag, state, alpha: float):
    """EMA unit-norm of band magnitudes; returns (normed, new_state)."""
    state = xb_mag * (1.0 - alpha) + state * alpha
    return xb_mag / jnp.sqrt(state), state


def interp_band_gain(gains, widths: tuple):
    """Spread per-band gains [.., B] back to per-bin [.., F] (rectangular)."""
    fb_inv = jnp.asarray(erb_filterbank(widths, normalized=True, inverse=True))
    return jnp.matmul(gains, fb_inv)
