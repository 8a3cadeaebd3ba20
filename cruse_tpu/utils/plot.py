"""Plot suite (Agg backend): spectrograms, waveforms, line plots, heatmaps.

Equivalent of utils/plot.py (alignment heatmap, single/dual spectrogram,
line plots). All functions return the matplotlib figure so callers can feed
TensorBoard's add_figure or save to disk.
"""
from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _spec_db(wav: np.ndarray, n_fft: int = 320, hop: int = 160) -> np.ndarray:
    frames = np.lib.stride_tricks.sliding_window_view(np.asarray(wav), n_fft)[::hop]
    mag = np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=-1))
    return 20.0 * np.log10(mag + 1e-8).T  # [F, T]


def plot_spectrogram(wav, sr: int = 16000, n_fft: int = 320, hop: int = 160, title: str = ""):
    fig, ax = plt.subplots(figsize=(8, 3))
    db = _spec_db(wav, n_fft, hop)
    im = ax.imshow(db, origin="lower", aspect="auto", cmap="magma",
                   extent=[0, len(wav) / sr, 0, sr / 2 / 1000])
    ax.set_xlabel("time [s]")
    ax.set_ylabel("freq [kHz]")
    if title:
        ax.set_title(title)
    fig.colorbar(im, ax=ax, label="dB")
    fig.tight_layout()
    return fig


def plot_spectrograms(wavs, labels=None, sr: int = 16000, n_fft: int = 320, hop: int = 160):
    """Stacked spectrograms (noisy/enhanced/clean triptychs)."""
    n = len(wavs)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.5 * n))
    if n == 1:
        axes = [axes]
    for ax, wav, label in zip(axes, wavs, labels or [""] * n):
        db = _spec_db(wav, n_fft, hop)
        ax.imshow(db, origin="lower", aspect="auto", cmap="magma")
        ax.set_title(
            f"{label}  mean {db.mean():.1f} dB, max {db.max():.1f} dB" if label else ""
        )
    fig.tight_layout()
    return fig


def plot_waveforms(wavs, labels=None, sr: int = 16000):
    fig, ax = plt.subplots(figsize=(8, 3))
    t = None
    for i, wav in enumerate(wavs):
        wav = np.asarray(wav)
        t = np.arange(len(wav)) / sr
        ax.plot(t, wav, lw=0.5, alpha=0.8, label=(labels[i] if labels else None))
    ax.set_xlabel("time [s]")
    if labels:
        ax.legend()
    fig.tight_layout()
    return fig


def plot_heatmap(matrix, title: str = "", xlabel: str = "", ylabel: str = ""):
    """Generic heatmap (the reference's alignment plot)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(matrix), origin="lower", aspect="auto", cmap="viridis")
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig


def plot_lines(series: dict, xlabel: str = "", ylabel: str = "", title: str = ""):
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, values in series.items():
        ax.plot(np.asarray(values), label=name)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    return fig


def plot_mask(mask, title: str = "gain mask"):
    """[T, F] gain mask in [0, 1]."""
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(np.asarray(mask).T, origin="lower", aspect="auto",
                   cmap="viridis", vmin=0.0, vmax=1.0)
    ax.set_title(title)
    ax.set_xlabel("frame")
    ax.set_ylabel("bin")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig
