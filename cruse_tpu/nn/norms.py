"""Streaming / cumulative input normalizations (FullSubNet & DeepFilterNet
families), time-major layout [..., T, F].

The reference implements these with per-frame python loops
(train_base/model/base_model.py:88-300, test/test_norm.py); here the
cumulative variants are pure `cumsum` (one fused VPU pass) and the EMA
variants are `lax.scan` carrying [..., 1]-or-[..., F] state, so they run
on-device at full batch width and have exact streaming equivalents (feed the
carry back in frame by frame).

All functions take [..., T, F] and normalize per frame over the last (freq)
axis unless noted. Reference layouts are [B, (C,) F, T]; transpose when
comparing goldens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

EPSILON = 1e-10


def offline_laplace_norm(x: jax.Array) -> jax.Array:
    """x / mean(|x|-domain mean over everything but batch) (base_model.py:202-215)."""
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    return x / (mu + 1e-5)


def cumulative_laplace_norm(x: jax.Array) -> jax.Array:
    """x_t / mean(x_{<=t}) with the running mean over all freq bins so far
    (base_model.py:218-245). [..., T, F]."""
    n_freqs = x.shape[-1]
    step_sum = jnp.sum(x, axis=-1)  # [..., T]
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    t = x.shape[-2]
    entry_count = jnp.arange(n_freqs, n_freqs * t + 1, n_freqs, dtype=x.dtype)
    cum_mean = cum_sum / entry_count
    return x / (cum_mean[..., None] + EPSILON)


def cumulative_laplace_norm_carry(x: jax.Array, carry=None):
    """Stateful cumulative_laplace_norm: returns (y, carry) where carry =
    (running bin sum [...], running bin count [...]) so chunked streaming is
    bit-exact with one full-sequence call. x: [..., T, F]."""
    n_freqs = x.shape[-1]
    t = x.shape[-2]
    if carry is None:
        prev_sum = jnp.zeros(x.shape[:-2], x.dtype)
        prev_count = jnp.zeros(x.shape[:-2], x.dtype)
    else:
        prev_sum, prev_count = carry
    step_sum = jnp.sum(x, axis=-1)  # [..., T]
    cum_sum = prev_sum[..., None] + jnp.cumsum(step_sum, axis=-1)
    counts = prev_count[..., None] + jnp.arange(
        n_freqs, n_freqs * t + 1, n_freqs, dtype=x.dtype
    )
    cum_mean = cum_sum / counts
    y = x / (cum_mean[..., None] + EPSILON)
    return y, (cum_sum[..., -1], counts[..., -1])


def offline_gaussian_norm(x: jax.Array) -> jax.Array:
    """(x - mu) / (std + 1e-5), utterance-level, unbiased std like torch.std
    (base_model.py:247-261)."""
    axes = tuple(range(1, x.ndim))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    n = 1
    for a in axes:
        n *= x.shape[a]
    var = jnp.sum(jnp.square(x - mu), axis=axes, keepdims=True) / max(n - 1, 1)
    return (x - mu) / (jnp.sqrt(var) + 1e-5)


def cumulative_layer_norm(x: jax.Array) -> jax.Array:
    """Online zero-norm via cumulative mean/variance (base_model.py:263-300)."""
    n_freqs = x.shape[-1]
    t = x.shape[-2]
    step_sum = jnp.sum(x, axis=-1)
    step_pow_sum = jnp.sum(jnp.square(x), axis=-1)
    cum_sum = jnp.cumsum(step_sum, axis=-1)
    cum_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_count = jnp.arange(n_freqs, n_freqs * t + 1, n_freqs, dtype=x.dtype)
    cum_mean = cum_sum / entry_count
    cum_var = (cum_pow_sum - 2.0 * cum_mean * cum_sum) / entry_count + jnp.square(cum_mean)
    cum_std = jnp.sqrt(cum_var + EPSILON)
    return (x - cum_mean[..., None]) / cum_std[..., None]


def cumulative_layer_norm_carry(x: jax.Array, carry=None):
    """Stateful cumulative_layer_norm: returns (y, carry) where carry =
    (running sum, running power sum, running count), each shaped like the
    leading batch dims, so chunked/per-hop streaming is bit-exact with one
    full-sequence call (the same contract as cumulative_laplace_norm_carry).
    x: [..., T, F]."""
    n_freqs = x.shape[-1]
    t = x.shape[-2]
    if carry is None:
        prev_sum = jnp.zeros(x.shape[:-2], x.dtype)
        prev_pow = jnp.zeros(x.shape[:-2], x.dtype)
        prev_count = jnp.zeros(x.shape[:-2], x.dtype)
    else:
        prev_sum, prev_pow, prev_count = carry
    step_sum = jnp.sum(x, axis=-1)  # [..., T]
    step_pow = jnp.sum(jnp.square(x), axis=-1)
    cum_sum = prev_sum[..., None] + jnp.cumsum(step_sum, axis=-1)
    cum_pow = prev_pow[..., None] + jnp.cumsum(step_pow, axis=-1)
    counts = prev_count[..., None] + jnp.arange(
        n_freqs, n_freqs * t + 1, n_freqs, dtype=x.dtype
    )
    cum_mean = cum_sum / counts
    cum_var = (cum_pow - 2.0 * cum_mean * cum_sum) / counts + jnp.square(cum_mean)
    y = (x - cum_mean[..., None]) / jnp.sqrt(cum_var + EPSILON)[..., None]
    return y, (cum_sum[..., -1], cum_pow[..., -1], counts[..., -1])


def forgetting_norm(x: jax.Array, sample_length: int) -> jax.Array:
    """Per-frame EMA mean normalization with warmup (base_model.py:124-155).

    Warmup quirk preserved for parity: alp_t = min((t-1)/(t+1), alpha), which
    is -1 at t=0 (doubling the first frame's mean).
    """
    alpha = (sample_length - 1) / (sample_length + 1)
    t_total = x.shape[-2]

    frame_mean = jnp.mean(x, axis=-1)  # [..., T]
    idx = jnp.arange(t_total, dtype=x.dtype)
    alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)

    def step(mu, inputs):
        a, m = inputs
        mu_new = a * mu + (1.0 - a) * m
        return mu_new, mu_new

    mean_t = jnp.moveaxis(frame_mean, -1, 0)  # [T, ...]
    _, mu_seq = lax.scan(step, jnp.zeros_like(mean_t[0]), (alp, mean_t))
    mu = jnp.moveaxis(mu_seq, 0, -1)  # [..., T]
    return x / (mu[..., None] + EPSILON)


def sband_forgetting_norm(x: jax.Array, sample_length: int) -> jax.Array:
    """forgetting_norm but after warmup the update uses the center freq bin
    instead of the frame mean (base_model.py:88-121)."""
    alpha = (sample_length - 1) / (sample_length + 1)
    t_total = x.shape[-2]
    n_freqs = x.shape[-1]

    frame_mean = jnp.mean(x, axis=-1)
    center = x[..., n_freqs // 2 - 1]
    idx = jnp.arange(t_total, dtype=x.dtype)
    warm = idx < sample_length
    alp = jnp.where(warm, jnp.minimum((idx - 1.0) / (idx + 1.0), alpha), alpha)
    drive = jnp.where(warm[..., :], frame_mean, center) if frame_mean.ndim == 1 else jnp.where(
        jnp.broadcast_to(warm, frame_mean.shape), frame_mean, center
    )

    def step(mu, inputs):
        a, m = inputs
        mu_new = a * mu + (1.0 - a) * m
        return mu_new, mu_new

    drive_t = jnp.moveaxis(drive, -1, 0)
    _, mu_seq = lax.scan(step, jnp.zeros_like(drive_t[0]), (alp, drive_t))
    mu = jnp.moveaxis(mu_seq, 0, -1)
    return x / (mu[..., None] + EPSILON)


def hybrid_norm(x: jax.Array, sample_length: int = 192) -> jax.Array:
    """forgetting-norm warmup, cumulative mean afterwards (base_model.py:157-200)."""
    t_total = x.shape[-2]
    n_freqs = x.shape[-1]
    alpha = (sample_length - 1) / (sample_length + 1)
    frame_mean = jnp.mean(x, axis=-1)
    idx = jnp.arange(t_total, dtype=x.dtype)
    alp = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)

    def step(mu, inputs):
        a, m = inputs
        mu_new = a * mu + (1.0 - a) * m
        return mu_new, mu_new

    mean_t = jnp.moveaxis(frame_mean, -1, 0)
    _, mu_seq = lax.scan(step, jnp.zeros_like(mean_t[0]), (alp, mean_t))
    ema_mu = jnp.moveaxis(mu_seq, 0, -1)  # [..., T]

    step_sum = jnp.sum(x, axis=-1)
    cum_mean = jnp.cumsum(step_sum, axis=-1) / jnp.arange(
        n_freqs, n_freqs * t_total + 1, n_freqs, dtype=x.dtype
    )
    t_idx = jnp.arange(t_total)
    mu = jnp.where(t_idx < sample_length, ema_mu, cum_mean)
    return x / (mu[..., None] + EPSILON)


def get_norm_alpha(sr: int = 16000, hop: int = 160, tau: float = 1.0) -> float:
    """EMA decay from a time constant in seconds (test/test_norm.py:12-30)."""
    dt = hop / sr
    import math

    return math.exp(-dt / tau)


def exponential_unit_norm(
    mag: jax.Array, alpha: float, state: jax.Array | None = None, eps: float = 1e-14
):
    """DeepFilterNet-style per-bin magnitude EMA unit norm
    (test/test_norm.py:43-61): s_t = alpha*s_{t-1} + (1-alpha)*|x_t|,
    y_t = x_t / sqrt(s_t). Returns (y, final_state).

    mag: [..., T, F]; state: [..., F] (defaults to linspace(1e-3, 1e-4)).
    """
    t_total, n_freqs = mag.shape[-2], mag.shape[-1]
    if state is None:
        init = jnp.linspace(1e-3, 1e-4, n_freqs, dtype=mag.dtype)
        state = jnp.broadcast_to(init, mag.shape[:-2] + (n_freqs,))

    def step(s, m):
        s_new = alpha * s + (1.0 - alpha) * m
        return s_new, s_new

    mag_t = jnp.moveaxis(mag, -2, 0)  # [T, ..., F]
    s_last, s_seq = lax.scan(step, state, mag_t)
    s = jnp.moveaxis(s_seq, 0, -2)
    return mag / jnp.sqrt(s + eps), s_last


NORM_REGISTRY = {
    "offline_laplace_norm": offline_laplace_norm,
    "cumulative_laplace_norm": cumulative_laplace_norm,
    "offline_gaussian_norm": offline_gaussian_norm,
    "cumulative_layer_norm": cumulative_layer_norm,
    "forgetting_norm": forgetting_norm,
    "sband_forgetting_norm": sband_forgetting_norm,
    "hybrid_norm": hybrid_norm,
}


def norm_wrapper(norm_type: str):
    """String dispatch (base_model.py:302-314)."""
    if norm_type not in NORM_REGISTRY:
        raise NotImplementedError(
            f"unknown norm {norm_type!r}; choose from {sorted(NORM_REGISTRY)}"
        )
    return NORM_REGISTRY[norm_type]
