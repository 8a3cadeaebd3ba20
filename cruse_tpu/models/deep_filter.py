"""Deep filtering: complex multi-frame filters applied to the STFT.

The reference's DeepFilter (model/deep_filter.py:15-41, repaired per
SURVEY.md §2.9: the kernel reshape is invalid syntax and the imaginary term
uses the wrong operand) unfolds a (2t+1)x(2f+1) neighborhood with an
identity-kernel conv and complex-multiplies with predicted filters.

TPU-native design: no unfold/materialized neighborhoods -- each tap is a
static shift of the spectrum fused into a multiply-accumulate. This path is
autodiff-able and is the training formulation; a single-HBM-pass Pallas
kernel for the causal case lives in cruse_tpu.ops.deep_filter_kernel
(parity-tested; measured against this path by
scripts/profile_deep_filter.py). Supports both the reference's symmetric
(non-causal) tap layout and the DeepFilterNet-style causal layout (taps
reach only into the past).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _shift2d(x: jax.Array, dt: int, df: int) -> jax.Array:
    """Shift [B, T, F] by (dt, df) with zero fill: out[t, f] = x[t-dt, f-df]."""
    b, t, f = x.shape
    out = x
    if dt > 0:
        out = jnp.pad(out, ((0, 0), (dt, 0), (0, 0)))[:, :t]
    elif dt < 0:
        out = jnp.pad(out, ((0, 0), (0, -dt), (0, 0)))[:, -dt:]
    if df > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (df, 0)))[:, :, :f]
    elif df < 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, -df)))[:, :, -df:]
    return out


def tap_offsets(t_dim: int, f_dim: int, causal: bool = False):
    """Tap layout: time offsets in [-t, t] (or [0, 2t] past-only when causal),
    freq offsets in [-f, f]."""
    t_range = range(0, 2 * t_dim + 1) if causal else range(-t_dim, t_dim + 1)
    return [(dt, df) for dt in t_range for df in range(-f_dim, f_dim + 1)]


def deep_filter_apply(
    spec_r: jax.Array,
    spec_i: jax.Array,
    coef_r: jax.Array,
    coef_i: jax.Array,
    t_dim: int,
    f_dim: int,
    causal: bool = False,
):
    """Apply per-TF-bin complex multi-frame filters.

    spec_*: [B, T, F]; coef_*: [B, T, F, K] with K == (2t+1)(2f+1) taps
    ordered by `tap_offsets`. Returns (out_r, out_i) [B, T, F]:
        out[t, f] = sum_k coef[t, f, k] * spec[t - dt_k, f - df_k]
    (complex product, so real/imag cross terms -- the repaired
    deep_filter.py:37-38 math).
    """
    offsets = tap_offsets(t_dim, f_dim, causal)
    assert coef_r.shape[-1] == len(offsets), (coef_r.shape, len(offsets))
    out_r = jnp.zeros_like(spec_r)
    out_i = jnp.zeros_like(spec_i)
    for k, (dt, df) in enumerate(offsets):
        sr = _shift2d(spec_r, dt, df)
        si = _shift2d(spec_i, dt, df)
        cr = coef_r[..., k]
        ci = coef_i[..., k]
        out_r = out_r + sr * cr - si * ci
        out_i = out_i + sr * ci + si * cr
    return out_r, out_i


def _shift2d_tm(x: jax.Array, dt: int, df: int) -> jax.Array:
    """T-minor _shift2d: shift [B, F, T] so out[f, t] = x[f - df, t - dt]."""
    b, f, t = x.shape
    out = x
    if dt > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (dt, 0)))[..., :t]
    elif dt < 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, -dt)))[..., -dt:]
    if df > 0:
        out = jnp.pad(out, ((0, 0), (df, 0), (0, 0)))[:, :f]
    elif df < 0:
        out = jnp.pad(out, ((0, 0), (0, -df), (0, 0)))[:, -df:]
    return out


def deep_filter_apply_tm(
    spec_r: jax.Array,
    spec_i: jax.Array,
    coef_r: jax.Array,
    coef_i: jax.Array,
    t_dim: int,
    f_dim: int,
    causal: bool = False,
):
    """deep_filter_apply in the T-minor layout: spec_* [B, F, T], coef_*
    [B, F, K, T]; returns (out_r, out_i) [B, F, T]. Same math and tap order
    (parity test: tests/test_deep_filter.py::test_tm_matches_tmajor).

    Why it exists: MTFAA's coefficient head emits [B, F*K*2, T] in the
    model's T-minor layout; this apply consumes it directly (the reshape is
    free, every tap a lane/sublane shift) instead of relaying the
    ~46M-element coef tensor through [B, T, F, K] transposes. Measured
    effect on the full windowed train step: NEUTRAL (123.8 -> 123.6 ms —
    XLA was already folding the transposes into adjacent ops), so the DF
    group's 9.6 ms-over-floor lives in the coef-head matmul scheduling,
    not the layout. Kept because it is the structurally simpler path for
    the T-minor model and removes the relayout in isolation."""
    offsets = tap_offsets(t_dim, f_dim, causal)
    assert coef_r.shape[2] == len(offsets), (coef_r.shape, len(offsets))
    out_r = jnp.zeros_like(spec_r)
    out_i = jnp.zeros_like(spec_i)
    for k, (dt, df) in enumerate(offsets):
        sr = _shift2d_tm(spec_r, dt, df)
        si = _shift2d_tm(spec_i, dt, df)
        cr = coef_r[:, :, k]
        ci = coef_i[:, :, k]
        out_r = out_r + sr * cr - si * ci
        out_i = out_i + sr * ci + si * cr
    return out_r, out_i


class DeepFilterHead(nn.Module):
    """Predict complex multi-frame filter coefficients from features and
    apply them to the noisy spectrum.

    Call: (features [B, T, D], spec complex [B, T, F]) -> enhanced complex.
    The coefficient head is a Dense to F * K * 2; DeepFilterNet-style
    normalization divides coefficients by the tap count.
    """

    t_dim: int = 1
    f_dim: int = 2
    causal: bool = True
    num_freqs: int = 161

    @property
    def num_taps(self) -> int:
        return (2 * self.t_dim + 1) * (2 * self.f_dim + 1)

    @nn.compact
    def __call__(self, features: jax.Array, spec: jax.Array):
        k = self.num_taps
        coefs = nn.Dense(self.num_freqs * k * 2, name="coef_head")(features)
        coefs = coefs.reshape(*features.shape[:-1], self.num_freqs, k, 2) / k
        out_r, out_i = deep_filter_apply(
            jnp.real(spec),
            jnp.imag(spec),
            coefs[..., 0],
            coefs[..., 1],
            self.t_dim,
            self.f_dim,
            self.causal,
        )
        return jax.lax.complex(out_r, out_i)
