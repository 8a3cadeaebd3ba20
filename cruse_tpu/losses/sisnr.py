"""Scale-invariant SNR losses (time domain).

Two reference variants are reproduced exactly:
- projection form, no DC removal, 10*log10 (loss_func/loss.py:48-56)
- zero-mean form, 20*log10 of amplitude-norm ratio (train_base/loss.py:7-25)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot_last(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def si_snr(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean SI-SNR in dB over the batch (higher is better).

    est/ref: [..., L]. Projection of est onto ref defines the target.
    """
    t = _dot_last(est, ref) / (_dot_last(ref, ref) + eps) * ref
    e = est - t
    snr = 10.0 * jnp.log10(_dot_last(t, t) / (_dot_last(e, e) + eps) + eps)
    return jnp.mean(snr)


def si_snr_zero_mean(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Zero-mean variant with 20*log10 on L2 norms (train_base/loss.py)."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    proj = _dot_last(est, ref) / (_dot_last(ref, ref) + eps) * ref
    noise = est - proj
    ratio = jnp.sqrt(_dot_last(proj, proj)) / (jnp.sqrt(_dot_last(noise, noise)) + eps)
    return jnp.mean(20.0 * jnp.log10(ratio + eps))


def si_snr_loss(est: jax.Array, ref: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Negative SI-SNR (minimize)."""
    return -si_snr(est, ref, eps)
