"""Training-target masks: IRM / complex IRM with cIRM compression.

Behavior mirrors train_base/acoustics/mask.py:8-63 (K=10, C=0.1 compression,
+-9.9 decompression clamp) plus the reference post-filters
(utils/utils.py:345-362, test/test_erb.py:151-159). Everything is elementwise
jnp -- XLA fuses these into surrounding ops.
"""
from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-8


def build_ideal_ratio_mask(noisy_mag, clean_mag):
    """IRM = |S| / |Y|, cIRM-compressed. [..., F] -> [..., F]."""
    ratio = clean_mag / (noisy_mag + EPSILON)
    return compress_cirm(ratio, k=10.0, c=0.1)


def build_complex_ideal_ratio_mask(noisy, clean):
    """cIRM from complex spectra; returns (real, imag) compressed masks."""
    denom = jnp.square(jnp.real(noisy)) + jnp.square(jnp.imag(noisy)) + EPSILON
    mask_r = (jnp.real(noisy) * jnp.real(clean) + jnp.imag(noisy) * jnp.imag(clean)) / denom
    mask_i = (jnp.real(noisy) * jnp.imag(clean) - jnp.imag(noisy) * jnp.real(clean)) / denom
    return compress_cirm(mask_r), compress_cirm(mask_i)


def compress_cirm(mask, k=10.0, c=0.1):
    """Compress (-inf, inf) -> (-K, K) via scaled tanh (mask.py:41-51)."""
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return k * (1.0 - jnp.exp(-c * mask)) / (1.0 + jnp.exp(-c * mask))


def decompress_cirm(mask, k=10.0, limit=9.9):
    """Inverse of compress_cirm with +-limit clamp (mask.py:54-57)."""
    mask = jnp.clip(mask, -limit, limit)
    return -k * jnp.log((k - mask) / (k + mask))


def complex_mul(noisy_r, noisy_i, mask_r, mask_i):
    """(a+bi)(c+di) split into components (mask.py:60-63)."""
    return (
        noisy_r * mask_r - noisy_i * mask_i,
        noisy_r * mask_i + noisy_i * mask_r,
    )


def iam(clean_mag, noisy_mag, eps=EPSILON):
    """Ideal amplitude mask |S|/|Y| (test/test_loss.py reference formulas)."""
    return clean_mag / (noisy_mag + eps)


def irm(clean_mag, noise_mag, eps=EPSILON):
    """Ideal ratio mask |S| / (|S| + |N|)."""
    return clean_mag / (clean_mag + noise_mag + eps)


def wiener_gain(clean_mag, noise_mag, eps=EPSILON):
    """Wiener-style gain |S|^2 / (|S|^2 + |N|^2)."""
    cp = jnp.square(clean_mag)
    return cp / (cp + jnp.square(noise_mag) + eps)


def postfilter_sin(mask, beta=0.02):
    """RNNoise-ish sin-based sharpening of a [0,1] gain
    (utils/utils.py:345-349 intent): g' = g * sin(pi/2 * g)^(beta-weighted)."""
    g_sin = mask * jnp.sin(jnp.pi * mask / 2.0)
    return (1.0 + beta) * mask / (1.0 + beta * jnp.square(jnp.where(g_sin > 0, mask / jnp.maximum(g_sin, 1e-8), 1.0)))


def envelope_postfilter(gain, tau=0.02):
    """Perceptually-motivated envelope postfilter for IRM-style gains
    (utils/utils.py:352-362): soften gains to reduce musical noise."""
    g_hat = gain * jnp.sin(jnp.clip(jnp.pi * gain / 2.0, 0.0, jnp.pi / 2.0))
    return (1.0 + tau) * gain / (1.0 + tau * jnp.square(jnp.where(g_hat > 1e-8, gain / jnp.maximum(g_hat, 1e-8), 1.0)))
