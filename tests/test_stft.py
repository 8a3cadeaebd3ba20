"""STFT/iSTFT parity vs torch + perfect-reconstruction invariants.

Mirrors the reference's test genres (SURVEY.md §4): numerical invariants and
golden parity against a torch implementation of the same transform.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

from cruse_tpu.dsp import StftConfig, stft, istft, mc_stft, mag_phase
from cruse_tpu.dsp.stft import istft_mag_phase


CFGS = [
    StftConfig(n_fft=512, hop_length=256),
    StftConfig(n_fft=512, hop_length=160),
    StftConfig(n_fft=320, hop_length=160, win_length=320),
    StftConfig(n_fft=512, hop_length=128, window="sqrt_hann"),
    StftConfig(n_fft=512, hop_length=256, win_length=400),
]


def _torch_window(cfg):
    if cfg.window == "hann":
        return torch.hann_window(cfg.win_length)
    if cfg.window == "sqrt_hann":
        return torch.hann_window(cfg.win_length) ** 0.5
    if cfg.window == "hamming":
        return torch.hamming_window(cfg.win_length)
    raise ValueError(cfg.window)


@pytest.mark.parametrize("cfg", CFGS, ids=[f"{c.n_fft}-{c.hop_length}-{c.window}-{c.win_length}" for c in CFGS])
def test_stft_matches_torch(cfg, rng):
    y = rng.standard_normal((2, 16000)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(y), cfg))  # [B, T, F]
    ref = torch.stft(
        torch.from_numpy(y),
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        window=_torch_window(cfg),
        return_complex=True,
        center=True,
    ).numpy()  # [B, F, T]
    ref = np.transpose(ref, (0, 2, 1))
    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("cfg", CFGS, ids=[f"{c.n_fft}-{c.hop_length}-{c.window}-{c.win_length}" for c in CFGS])
def test_istft_matches_torch(cfg, rng):
    y = rng.standard_normal((2, 16000)).astype(np.float32)
    spec_t = torch.stft(
        torch.from_numpy(y),
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        window=_torch_window(cfg),
        return_complex=True,
        center=True,
    )
    ref = torch.istft(
        spec_t,
        cfg.n_fft,
        cfg.hop_length,
        cfg.win_length,
        window=_torch_window(cfg),
        length=16000,
        center=True,
    ).numpy()
    spec_j = jnp.asarray(np.transpose(spec_t.numpy(), (0, 2, 1)))
    ours = np.asarray(istft(spec_j, cfg, length=16000))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=0)


@pytest.mark.parametrize("cfg", CFGS, ids=[f"{c.n_fft}-{c.hop_length}-{c.window}-{c.win_length}" for c in CFGS])
def test_round_trip_perfect_reconstruction(cfg, rng):
    y = rng.standard_normal((1, 8000)).astype(np.float32)
    rec = np.asarray(istft(stft(jnp.asarray(y), cfg), cfg, length=8000))
    np.testing.assert_allclose(rec, y, atol=1e-4, rtol=0)


def test_mag_phase_istft_roundtrip(rng):
    cfg = StftConfig(n_fft=512, hop_length=256)
    y = rng.standard_normal((1, 8000)).astype(np.float32)
    spec = stft(jnp.asarray(y), cfg)
    mag, phase = mag_phase(spec)
    rec = np.asarray(istft_mag_phase(mag, phase, cfg, length=8000))
    np.testing.assert_allclose(rec, y, atol=1e-3, rtol=0)


def test_mc_stft_shape(rng):
    cfg = StftConfig(n_fft=512, hop_length=256)
    y = jnp.asarray(rng.standard_normal((2, 4, 8000)).astype(np.float32))
    spec = mc_stft(y, cfg)
    assert spec.shape == (2, 4, cfg.num_frames(8000), cfg.num_bins)
    # channel fold/unfold must not mix channels
    single = stft(y[0, 1], cfg)
    np.testing.assert_allclose(np.asarray(spec[0, 1]), np.asarray(single), atol=1e-4)


def test_conv_stft_class_api(rng):
    """Reference CustomSTFT/CustomISTFT class surface (feature.py:337-398)."""
    from cruse_tpu.dsp.stft import ConvSTFT, ConvISTFT

    y = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32) * 0.2)
    st = ConvSTFT(320, 160)
    ist = ConvISTFT(320, 160)
    mag, phase, real, imag = st(y)
    assert mag.shape == phase.shape == real.shape == imag.shape
    np.testing.assert_allclose(np.asarray(mag), np.hypot(np.asarray(real), np.asarray(imag)), atol=1e-5)
    rec = ist(mag, phase, length=8000)
    np.testing.assert_allclose(
        np.asarray(rec)[:, 320:-320], np.asarray(y)[:, 320:-320], atol=1e-4
    )


def test_stable_angle_gradient(rng):
    from cruse_tpu.losses.spectral import stable_angle

    r = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    i = jnp.asarray(rng.standard_normal(16).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(stable_angle(r, i)), np.arctan2(np.asarray(i), np.asarray(r)), atol=1e-6
    )
    g = jax.grad(lambda ri: jnp.sum(stable_angle(ri[0], ri[1])))(jnp.zeros((2, 4)))
    assert bool(jnp.isfinite(g).all())  # plain arctan2 would be NaN here


def test_istft_length_pad(rng):
    cfg = StftConfig(n_fft=512, hop_length=256)
    y = rng.standard_normal((1, 8000)).astype(np.float32)
    out = istft(stft(jnp.asarray(y), cfg), cfg, length=9000)
    assert out.shape == (1, 9000)
    # beyond the OLA buffer everything is zero-padded (torch semantics)
    ola_avail = 512 + 256 * (cfg.num_frames(8000) - 1) - 256
    np.testing.assert_allclose(np.asarray(out[:, ola_avail:]), 0.0)
