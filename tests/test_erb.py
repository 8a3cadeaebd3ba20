"""ERB filterbank invariants + golden parity vs a scalar torch reference."""
import numpy as np
import torch
import jax.numpy as jnp

from cruse_tpu.dsp.erb import (
    erb_widths,
    erb_filterbank,
    apply_erb,
    inverse_erb,
    freq2erb,
    erb2freq,
    compute_band_corr,
    interp_band_gain,
)


def _torch_erb_widths(sr, fft_size, nb_bands, min_nb_freqs):
    """Scalar golden re-derivation of the reference allocator
    (cust_conv.py:218-247) using torch ops."""
    nyq = sr / 2
    freq_width = sr / fft_size
    erb_low = 9.265 * torch.log1p(torch.tensor([0.0]) / (24.7 * 9.265))
    erb_high = 9.265 * torch.log1p(torch.tensor([float(nyq)]) / (24.7 * 9.265))
    erb = torch.zeros([nb_bands], dtype=torch.int16)
    step = (erb_high - erb_low) / nb_bands
    prev_freq, freq_over = 0, 0
    for i in range(nb_bands):
        f = 24.7 * 9.265 * (torch.exp((erb_low + (i + 1) * step) / 9.265) - 1.0)
        fb = int(torch.round(f / freq_width))
        nb_freqs = fb - prev_freq - freq_over
        if nb_freqs < min_nb_freqs:
            freq_over = min_nb_freqs - nb_freqs
            nb_freqs = min_nb_freqs
        else:
            freq_over = 0
        erb[i] = nb_freqs
        prev_freq = fb
    erb[nb_bands - 1] += 1
    too_large = torch.sum(erb) - (fft_size / 2 + 1)
    if too_large > 0:
        erb[nb_bands - 1] -= int(too_large)
    return tuple(int(x) for x in erb)


def test_widths_match_reference_allocator():
    for sr, fft, nb, mn in [(48000, 960, 32, 2), (16000, 512, 32, 1), (16000, 320, 24, 1)]:
        assert erb_widths(sr, fft, nb, mn) == _torch_erb_widths(sr, fft, nb, mn)


def test_widths_sum():
    w = erb_widths(16000, 512, 32, 2)
    assert sum(w) == 257
    assert min(w) >= 2


def test_freq_erb_roundtrip():
    f = np.linspace(0, 8000, 100)
    np.testing.assert_allclose(erb2freq(freq2erb(f)), f, rtol=1e-9)


def test_filterbank_shapes_and_partition():
    w = erb_widths(16000, 512, 32, 2)
    fb = erb_filterbank(w, normalized=False)
    assert fb.shape == (257, 32)
    # unnormalized analysis: every bin belongs to exactly one band
    np.testing.assert_allclose(fb.sum(axis=1), 1.0)
    fbn = erb_filterbank(w, normalized=True)
    np.testing.assert_allclose(fbn.sum(axis=0), 1.0, rtol=1e-6)


def test_band_constant_reconstruction():
    """Band-constant spectra survive analysis -> synthesis exactly."""
    w = erb_widths(16000, 512, 32, 2)
    fb = erb_filterbank(w, normalized=True)
    fb_inv = erb_filterbank(w, normalized=True, inverse=True)
    rng = np.random.default_rng(0)
    band_vals = rng.random((3, 32)).astype(np.float32)
    x = np.asarray(inverse_erb(jnp.asarray(band_vals), fb_inv))  # [3, 257]
    back = np.asarray(apply_erb(jnp.asarray(x), fb))
    np.testing.assert_allclose(back, band_vals, rtol=1e-5)


def test_band_corr_matches_manual():
    w = erb_widths(16000, 512, 8, 16)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((2, 257)) + 1j * rng.standard_normal((2, 257))
    b = rng.standard_normal((2, 257)) + 1j * rng.standard_normal((2, 257))
    out = np.asarray(compute_band_corr(jnp.asarray(a), jnp.asarray(b), w, normalized=False))
    # manual per-band sum
    starts = np.cumsum([0] + list(w))
    want = np.stack(
        [
            [(a[i, s:e].real * b[i, s:e].real + a[i, s:e].imag * b[i, s:e].imag).sum() for s, e in zip(starts[:-1], starts[1:])]
            for i in range(2)
        ]
    )
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_interp_band_gain_spreads():
    w = erb_widths(16000, 512, 8, 16)
    gains = jnp.ones((1, 8)) * 0.5
    out = np.asarray(interp_band_gain(gains, w))
    assert out.shape == (1, 257)
    np.testing.assert_allclose(out, 0.5, rtol=1e-6)
