"""STFT / iSTFT as fused strided matmuls (TPU-native).

Design
------
Instead of translating ``torch.stft`` (FFT-per-frame), the analysis transform
is a single strided convolution of the waveform against a *windowed DFT basis*
``K[2F, 1, N]``: framing, windowing and the DFT all fuse into one MXU matmul.
The synthesis transform is the transposed convolution against the windowed
inverse-DFT basis, which performs the overlap-add in the same matmul, followed
by the squared-window envelope compensation. Both paths are static-shape,
jit-friendly, and differentiable.

Numerical semantics match ``torch.stft`` / ``torch.istft`` with
``center=True`` (reflect padding, periodic windows, one-sided spectra) so the
parity suite can compare against the torch reference bit-for-bit at float32.

Reference behavior being reproduced (not ported):
  - train_base/acoustics/feature.py:10-89  (stft/istft/mc_stft/mag_phase)
  - train_base/acoustics/feature.py:272-398 (conv-STFT formulation)
  - train_base/acoustics/conv_stft.py (FFT-matrix conv STFT, OLA compensation)

Shape convention: waveforms are ``[B, L]``; spectra are **time-major**
``[B, T, F]`` (freq on the TPU lane dimension). The reference uses
``[B, F, T]``; transpose when comparing.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cruse_tpu.dsp.windows import get_window

_DN_1D = ("NCH", "OIH", "NCH")  # batch/chan/spatial conv layout for 1-D convs


@dataclasses.dataclass(frozen=True)
class StftConfig:
    """Static STFT geometry; hashable so jitted closures cache per-config."""

    n_fft: int = 512
    hop_length: int = 256
    win_length: int | None = None
    window: str = "hann"
    center: bool = True
    pad_mode: str = "reflect"

    def __post_init__(self):
        if self.win_length is None:
            object.__setattr__(self, "win_length", self.n_fft)
        assert self.win_length <= self.n_fft
        assert self.hop_length > 0

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, length: int) -> int:
        padded = length + (self.n_fft if self.center else 0)
        return 1 + (padded - self.n_fft) // self.hop_length


def _padded_window(cfg: StftConfig) -> np.ndarray:
    """Window zero-padded (centered) to n_fft, like torch.stft."""
    w = get_window(cfg.window, cfg.win_length, periodic=True)
    if cfg.win_length < cfg.n_fft:
        left = (cfg.n_fft - cfg.win_length) // 2
        w = np.pad(w, (left, cfg.n_fft - cfg.win_length - left))
    return w.astype(np.float64)


@functools.lru_cache(maxsize=None)
def _analysis_kernel(cfg: StftConfig) -> np.ndarray:
    """Windowed forward DFT basis, shape [2F, 1, N] (real rows then imag)."""
    n, f = cfg.n_fft, cfg.num_bins
    w = _padded_window(cfg)
    idx = np.outer(np.arange(f), np.arange(n))  # [F, N]
    ang = -2.0 * np.pi * idx / n
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=0)  # [2F, N]
    return (basis * w[None, :]).astype(np.float32)[:, None, :]


@functools.lru_cache(maxsize=None)
def _synthesis_kernel(cfg: StftConfig) -> np.ndarray:
    """Windowed inverse DFT basis, shape [2F, 1, N].

    frame[n] = sum_f wf_f/N * (Re X_f cos(2pi f n/N) - Im X_f sin(.)), with
    wf_f = 2 except DC and Nyquist (conjugate-symmetry folding of the rFFT).
    The synthesis window multiplies each reconstructed frame before OLA.
    """
    n, f = cfg.n_fft, cfg.num_bins
    w = _padded_window(cfg)
    fold = np.full((f, 1), 2.0)
    fold[0] = 1.0
    if n % 2 == 0:
        fold[-1] = 1.0
    idx = np.outer(np.arange(f), np.arange(n))
    ang = 2.0 * np.pi * idx / n
    real_basis = fold * np.cos(ang) / n  # [F, N]
    imag_basis = -fold * np.sin(ang) / n
    basis = np.concatenate([real_basis, imag_basis], axis=0)  # [2F, N]
    return (basis * w[None, :]).astype(np.float32)[:, None, :]


@functools.lru_cache(maxsize=None)
def _ola_envelope(cfg: StftConfig, num_frames: int) -> np.ndarray:
    """Overlap-added squared-window normalization envelope (concrete numpy)."""
    n, hop = cfg.n_fft, cfg.hop_length
    w2 = _padded_window(cfg) ** 2
    length = n + hop * (num_frames - 1)
    env = np.zeros(length)
    for t in range(num_frames):
        env[t * hop : t * hop + n] += w2
    # Avoid division blowup where the window stack never covers (frame edges
    # that are trimmed away anyway). torch.istft uses a tiny nonzero guard.
    env = np.where(env > 1e-11, env, 1.0)
    return env.astype(np.float32)


def _frame_by_chunks(y: jax.Array, cfg: StftConfig) -> jax.Array:
    """Frame [B, L] -> [B, T, n_fft] with reshapes + strided slices only.

    Chunk the signal into g = gcd(n_fft, hop) blocks; every frame is K =
    n_fft/g consecutive chunks starting at a multiple of s = hop/g. No
    gather, no conv: XLA lowers this to cheap slices + one concat, feeding a
    single big matmul (the DFT). The conv_transpose/strided-conv formulation
    is pathological on TPU (input dilation by the stride).
    """
    import math

    n, hop = cfg.n_fft, cfg.hop_length
    g = math.gcd(n, hop)
    s, k = hop // g, n // g
    b, length = y.shape
    t = 1 + (length - n) // hop
    usable = (t - 1) * hop + n
    chunks = y[:, :usable].reshape(b, usable // g, g)
    parts = [chunks[:, c : c + (t - 1) * s + 1 : s] for c in range(k)]  # [B, T, g] each
    return jnp.concatenate(parts, axis=-1)  # [B, T, n]


def stft(y: jax.Array, cfg: StftConfig, dtype=jnp.float32) -> jax.Array:
    """Waveform [B, L] (or [L]) -> complex spectrum [B, T, F].

    Chunked framing + one MXU matmul against the windowed DFT basis.
    """
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    assert y.ndim == 2, f"expected [B, L], got {y.shape}"
    if cfg.center:
        p = cfg.n_fft // 2
        y = jnp.pad(y, ((0, 0), (p, p)), mode=cfg.pad_mode)
    frames = _frame_by_chunks(y.astype(dtype), cfg)  # [B, T, N]
    basis = jnp.asarray(_analysis_kernel(cfg)[:, 0, :].T, dtype)  # [N, 2F]
    c = jnp.matmul(frames, basis, precision=lax.Precision.HIGHEST)  # [B, T, 2F]
    f = cfg.num_bins
    spec = lax.complex(c[..., :f], c[..., f:])
    return spec[0] if squeeze else spec


def _overlap_add(frames: jax.Array, cfg: StftConfig) -> jax.Array:
    """OLA [B, T, N] -> [B, hop*(T-1) + N] via chunk reshapes + shifted adds.

    With g = gcd(n_fft, hop), s = hop/g, K = n_fft/g: frame t's chunk c lands
    at chunk position t*s + c. Group chunk indices by residue r = c mod s:
    within a residue class the target positions are disjoint strides, so the
    class reduces to a shifted elementwise add and an interleave -- no
    scatter, no conv_transpose (whose input dilation costs ~stride x the
    FLOPs on TPU).
    """
    import math

    b, t, n = frames.shape
    hop = cfg.hop_length
    g = math.gcd(n, hop)
    s, k = hop // g, n // g
    fr = frames.reshape(b, t, k, g)
    # residue r stream covers positions r, r+s, ...: row p holds position p*s+r
    streams = []
    for r in range(s):
        cs = [c for c in range(k) if c % s == r]
        length = t + max((c - r) // s for c in cs) + 1 if cs else 0
        acc = jnp.zeros((b, length, g), frames.dtype)
        for c in cs:
            off = (c - r) // s
            acc = acc + jnp.pad(fr[:, :, c], ((0, 0), (off, length - t - off), (0, 0)))
        streams.append(acc)
    if s == 1:
        y_chunks = streams[0]
    else:
        # interleave the residue streams: position j = p*s + r
        max_rows = max(st.shape[1] for st in streams)
        streams = [
            jnp.pad(st, ((0, 0), (0, max_rows - st.shape[1]), (0, 0))) for st in streams
        ]
        y_chunks = jnp.stack(streams, axis=2).reshape(b, max_rows * s, g)
    y = y_chunks.reshape(b, -1)[:, : (hop * (t - 1) + n)]
    return y


def _spec_to_ri(spec) -> jax.Array:
    """Complex [B, T, F] or (real, imag) pair -> stacked [B, 2F, T] reals."""
    if isinstance(spec, (tuple, list)):
        real, imag = spec
    else:
        real, imag = jnp.real(spec), jnp.imag(spec)
    return jnp.concatenate([real, imag], axis=-1).transpose(0, 2, 1)


def istft(
    spec,
    cfg: StftConfig,
    length: int | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Complex spectrum [B, T, F] -> waveform [B, L].

    Transposed conv against the windowed inverse-DFT basis performs the
    inverse transform *and* the overlap-add in one matmul; the result is
    normalized by the overlap-added squared window (torch.istft semantics).

    ``spec`` may be a complex array or a ``(real, imag)`` tuple (each
    [B, T, F]), or ``(mag, phase)`` via :func:`istft_mag_phase`.
    """
    ri = _spec_to_ri(spec).astype(dtype)  # [B, 2F, T]
    num_frames = ri.shape[-1]
    basis = jnp.asarray(_synthesis_kernel(cfg)[:, 0, :], dtype)  # [2F, N]
    frames = jnp.matmul(
        ri.transpose(0, 2, 1), basis, precision=lax.Precision.HIGHEST
    )  # [B, T, N] windowed synthesis frames
    y = _overlap_add(frames, cfg)  # [B, n_fft + hop*(T-1)]
    env = jnp.asarray(_ola_envelope(cfg, num_frames), dtype)
    y = y / env
    if cfg.center:
        y = y[:, cfg.n_fft // 2 :]
    if length is None:
        # default: also trim the tail half-window (torch.istft no-length)
        if cfg.center:
            y = y[:, : y.shape[-1] - cfg.n_fft // 2 - (cfg.n_fft - 2 * (cfg.n_fft // 2))]
    else:
        # explicit length: keep the partial-envelope tail (torch semantics)
        if length <= y.shape[-1]:
            y = y[:, :length]
        else:
            y = jnp.pad(y, ((0, 0), (0, length - y.shape[-1])))
    return y


def istft_mag_phase(mag, phase, cfg: StftConfig, length=None):
    """iSTFT from magnitude/phase (reference feature.py:47-51 semantics)."""
    return istft((mag * jnp.cos(phase), mag * jnp.sin(phase)), cfg, length)


def mc_stft(y: jax.Array, cfg: StftConfig) -> jax.Array:
    """Multi-channel STFT: [B, C, L] -> [B, C, T, F] (batch-folded)."""
    assert y.ndim == 3
    b, c, n = y.shape
    spec = stft(y.reshape(b * c, n), cfg)
    return spec.reshape(b, c, *spec.shape[1:])


def mag_phase(spec: jax.Array):
    """Split a complex spectrum into (magnitude, phase)."""
    return jnp.abs(spec), jnp.angle(spec)


class ConvSTFT:
    """Class-style conv-STFT layer API (reference CustomSTFT,
    feature.py:337-365): waveform -> (mag, phase, real, imag), with the
    kernel NaN guard. Wraps the fused-matmul implementation."""

    def __init__(self, frame_len: int, frame_hop: int, num_fft: int | None = None,
                 window: str = "sqrt_hann", center: bool = False):
        self.cfg = StftConfig(
            n_fft=num_fft or frame_len,
            hop_length=frame_hop,
            win_length=frame_len,
            window=window,
            center=center,
        )
        self.check_nan()

    def check_nan(self):
        k = _analysis_kernel(self.cfg)
        num_nan = int(np.isnan(k).sum())
        if num_nan:
            raise RuntimeError(f"detect nan in STFT kernels: {num_nan:d}")

    def __call__(self, x: jax.Array):
        spec = stft(x, self.cfg)
        real, imag = jnp.real(spec), jnp.imag(spec)
        mag = jnp.sqrt(real**2 + imag**2 + 1e-12)
        phase = jnp.arctan2(imag, real)
        return mag, phase, real, imag


class ConvISTFT:
    """Inverse pair (reference CustomISTFT, feature.py:368-398):
    (mag, phase) -> waveform."""

    def __init__(self, frame_len: int, frame_hop: int, num_fft: int | None = None,
                 window: str = "sqrt_hann", center: bool = False):
        self.cfg = StftConfig(
            n_fft=num_fft or frame_len,
            hop_length=frame_hop,
            win_length=frame_len,
            window=window,
            center=center,
        )

    def __call__(self, mag: jax.Array, phase: jax.Array, length: int | None = None):
        return istft_mag_phase(mag, phase, self.cfg, length=length)
