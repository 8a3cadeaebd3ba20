"""Pseudo-QMF cosine-modulated filterbank (analysis + synthesis).

TPU design: both directions are strided 1-D convolutions against precomputed
modulated prototype filters -- a single MXU matmul per hop, no per-subband
loops. Mirrors the behavior of the reference PQMF workbench
(test/test_pqmf.py:7-84): Kaiser-window prototype, cosine modulation with
per-band phase, conv analysis with stride == subbands, transposed-conv
synthesis scaled by the band count.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN_1D = ("NCH", "OIH", "NCH")


def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc lowpass prototype (scipy-free, numpy only).

    Matches ``scipy.signal.firwin(taps + 1, cutoff_ratio, window=("kaiser", beta))``.
    """
    assert taps % 2 == 0, "taps must be even"
    m = np.arange(taps + 1) - taps / 2.0
    # ideal lowpass impulse response at normalized cutoff (Nyquist = 1.0)
    h_ideal = cutoff_ratio * np.sinc(cutoff_ratio * m)
    win = np.i0(beta * np.sqrt(1.0 - (2.0 * np.arange(taps + 1) / taps - 1.0) ** 2)) / np.i0(beta)
    h = h_ideal * win
    # firwin scale=True: unit gain at DC
    return (h / h.sum()).astype(np.float64)


def _pr_error(subbands: int, taps: int, cutoff_ratio: float, beta: float) -> float:
    """Perfect-reconstruction error of the prototype: flatness of the
    overlap-added squared magnitude response across the band edges."""
    h = design_prototype_filter(taps, cutoff_ratio, beta)
    # pseudo-QMF power-complementarity at the band edge:
    # |H(w)|^2 + |H(pi/S - w)|^2 == const for w in [0, pi/S]
    n_fft = 2048
    mag2 = np.abs(np.fft.rfft(h, n_fft)) ** 2
    shift = n_fft // (2 * subbands)
    total = mag2[: shift + 1] + mag2[shift::-1]
    return float(np.max(np.abs(total / total.mean() - 1.0)))


@functools.lru_cache(maxsize=None)
def optimal_cutoff(subbands: int, taps: int = 62, beta: float = 9.0) -> float:
    """Grid+refine search for the PR-optimal prototype cutoff."""
    lo, hi = 0.5 / (2 * subbands), 1.5 / (2 * subbands)
    best_c, best_e = lo, np.inf
    for _ in range(4):
        grid = np.linspace(lo, hi, 25)
        errs = [_pr_error(subbands, taps, float(c), beta) for c in grid]
        i = int(np.argmin(errs))
        if errs[i] < best_e:
            best_e, best_c = errs[i], float(grid[i])
        lo = grid[max(i - 1, 0)]
        hi = grid[min(i + 1, len(grid) - 1)]
    return best_c


@functools.lru_cache(maxsize=None)
def pqmf_filters(subbands: int = 4, taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0):
    """(analysis [S, 1, N], synthesis [S, 1, N]) modulated filter stacks."""
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1)
    h_analysis = np.zeros((subbands, taps + 1))
    h_synthesis = np.zeros((subbands, taps + 1))
    for k in range(subbands):
        mod = (2 * k + 1) * (np.pi / (2 * subbands)) * (n - taps / 2.0)
        phase = (-1) ** k * np.pi / 4.0
        h_analysis[k] = 2.0 * h_proto * np.cos(mod + phase)
        h_synthesis[k] = 2.0 * h_proto * np.cos(mod - phase)
    return (
        h_analysis.astype(np.float32)[:, None, :],
        h_synthesis.astype(np.float32)[:, None, :],
    )


class PQMF:
    """Analysis/synthesis pair. ``x``: [B, L] -> subbands [B, S, L//S]."""

    def __init__(self, subbands: int = 4, taps: int = 62, cutoff_ratio: float | None = None, beta: float = 9.0):
        self.subbands = subbands
        self.taps = taps
        if cutoff_ratio is None:
            cutoff_ratio = optimal_cutoff(subbands, taps, beta)
        self.cutoff_ratio = cutoff_ratio
        ana, syn = pqmf_filters(subbands, taps, cutoff_ratio, beta)
        self.analysis_filter = ana
        self.synthesis_filter = syn

    def analysis(self, x: jax.Array) -> jax.Array:
        """[B, L] -> [B, S, L // S]; pads taps//2 each side (same-ish length)."""
        assert x.ndim == 2
        pad = self.taps // 2
        k = jnp.asarray(self.analysis_filter, x.dtype)
        return lax.conv_general_dilated(
            x[:, None, :],
            k,
            window_strides=(self.subbands,),
            padding=[(pad, pad)],
            dimension_numbers=_DN_1D,
            precision=lax.Precision.HIGHEST,
        )

    def synthesis(self, xs: jax.Array) -> jax.Array:
        """[B, S, L'] -> [B, L' * S] reconstructed waveform."""
        assert xs.ndim == 3
        pad = self.taps // 2
        # time-flip: conv_transpose indexes the kernel correlation-style while
        # the upsample+FIR formulation is a true convolution
        k = jnp.asarray(self.synthesis_filter[..., ::-1] * self.subbands, xs.dtype)
        y = lax.conv_transpose(
            xs,
            k,
            strides=(self.subbands,),
            padding="VALID",
            dimension_numbers=_DN_1D,
            transpose_kernel=True,
            precision=lax.Precision.HIGHEST,
        )[:, 0, :]
        # trim the analysis+synthesis padding transients; return exactly S * L'
        out_len = xs.shape[-1] * self.subbands
        y = y[:, pad : pad + out_len]
        if y.shape[-1] < out_len:
            y = jnp.pad(y, ((0, 0), (0, out_len - y.shape[-1])))
        return y
