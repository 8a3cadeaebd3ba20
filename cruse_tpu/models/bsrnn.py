"""BSRNN: band-split RNN with per-band 3-tap complex mask decoding, plus the
MetricGAN discriminator.

Behavior mirrors the reference prototype (test/testBSRNN.py:34-184):
- 31-band split table over 257 bins, per-band GroupNorm + Linear encoders
- num_layer residual time-LSTM blocks (unidirectional over T)
- num_layer residual band-LSTM blocks (bidirectional over the band axis)
- mask decoder: per band GroupNorm -> Linear 4N -> tanh -> Linear -> GLU ->
  per-bin 3-tap complex filter applied across adjacent frequency bins
- spectral-norm CNN discriminator with LearnableSigmoid for MetricGAN

Layout: [B, T, K, N] (time-major, band, channel). The per-band ragged
Linears stay a static python loop (31 small matmuls fused by XLA); the LSTM
stacks fold the band axis into the batch so each scan step is a wide matmul.

``causal=True`` swaps every GroupNorm(1, C) — the ONE non-causal piece of
the prototype besides the band-axis LSTMs (which run over frequency, not
time) — for a cumulative layer norm (per-frame stats over everything seen
so far, base_model.py:263-300 math) with the same learnable affine. That
makes the whole net frame-streamable: ``init_state``/carried state thread
the per-norm running sums and the time-LSTM (h, c) through T=1 steps,
bit-exact with the offline causal forward (tested).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cruse_tpu.nn.lstm import LSTM
from cruse_tpu.nn.norms import cumulative_layer_norm_carry

# band widths over 257 bins (testBSRNN.py:104-107)
BAND_WIDTHS: Tuple[int, ...] = (
    2, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8, 8,
    16, 16, 16, 16, 16, 16, 16, 17,
)
assert sum(BAND_WIDTHS) == 257


class _GroupNorm1(nn.Module):
    """torch GroupNorm(1, C): normalize over channels AND spatial dims."""

    @nn.compact
    def __call__(self, x: jax.Array, channel_axis: int = -1) -> jax.Array:
        # normalize over all non-batch axes
        axes = tuple(range(1, x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
        normed = (x - mu) / jnp.sqrt(var + 1e-5)
        c = x.shape[channel_axis]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        shape = [1] * x.ndim
        shape[channel_axis] = c
        return normed * scale.reshape(shape) + bias.reshape(shape)


class _CausalNorm1(nn.Module):
    """Causal analogue of torch GroupNorm(1, C): per-frame normalization by
    the cumulative mean/variance over every feature seen up to frame t
    (base_model.py:263-300 statistics), same learnable per-channel affine.
    Returns (y, carry); carry=None starts a fresh utterance."""

    @nn.compact
    def __call__(self, x: jax.Array, carry=None, channel_axis: int = -1):
        b, t = x.shape[0], x.shape[1]
        y, new_carry = cumulative_layer_norm_carry(x.reshape(b, t, -1), carry)
        y = y.reshape(x.shape)
        c = x.shape[channel_axis]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        shape = [1] * x.ndim
        shape[channel_axis] = c
        return y * scale.reshape(shape) + bias.reshape(shape), new_carry


class BandSplit(nn.Module):
    """[B, T, F, 2] RI spectrum -> [B, T, K, N] band features."""

    channels: int = 128
    widths: Tuple[int, ...] = BAND_WIDTHS
    causal: bool = False

    @nn.compact
    def __call__(self, x_ri: jax.Array, carries=None):
        outs, new_carries = [], []
        start = 0
        for i, w in enumerate(self.widths):
            xb = x_ri[:, :, start : start + w, :].reshape(*x_ri.shape[:2], w * 2)
            if self.causal:
                xb, c = _CausalNorm1(name=f"norm_{i}")(
                    xb, None if carries is None else carries[i])
                new_carries.append(c)
            else:
                xb = _GroupNorm1(name=f"norm_{i}")(xb)
            outs.append(nn.Dense(self.channels, name=f"fc_{i}")(xb))
            start += w
        z = jnp.stack(outs, axis=2)  # [B, T, K, N]
        return z, (tuple(new_carries) if self.causal else None)


class MaskDecoder(nn.Module):
    """[B, T, K, N] -> per-bin 3-tap complex filters [B, T, F, 3, 2]."""

    channels: int = 128
    widths: Tuple[int, ...] = BAND_WIDTHS
    causal: bool = False

    @nn.compact
    def __call__(self, z: jax.Array, carries=None):
        outs, new_carries = [], []
        for i, w in enumerate(self.widths):
            xb = z[:, :, i, :]
            if self.causal:
                xb, c = _CausalNorm1(name=f"norm_{i}")(
                    xb, None if carries is None else carries[i])
                new_carries.append(c)
            else:
                xb = _GroupNorm1(name=f"norm_{i}")(xb)
            xb = nn.Dense(4 * self.channels, name=f"fc1_{i}")(xb)
            xb = jnp.tanh(xb)
            xb = nn.Dense(12 * w, name=f"fc2_{i}")(xb)
            a, b = jnp.split(xb, 2, axis=-1)
            xb = a * jax.nn.sigmoid(b)  # GLU -> 6w
            outs.append(xb.reshape(*xb.shape[:-1], w, 3, 2))
        m = jnp.concatenate(outs, axis=2)  # [B, T, F, 3, 2]
        return m, (tuple(new_carries) if self.causal else None)


def apply_three_tap_mask(spec: jax.Array, m: jax.Array) -> jax.Array:
    """s[f] = m[f,0] x[f-1] + m[f,1] x[f] + m[f,2] x[f+1], complex, with the
    reference's edge handling (testBSRNN.py:94-97)."""
    mc = jax.lax.complex(m[..., 0], m[..., 1])  # [B, T, F, 3]
    mid = mc[:, :, 1:-1, 0] * spec[:, :, :-2] + mc[:, :, 1:-1, 1] * spec[:, :, 1:-1] + mc[:, :, 1:-1, 2] * spec[:, :, 2:]
    first = mc[:, :, 0, 1] * spec[:, :, 0] + mc[:, :, 0, 2] * spec[:, :, 1]
    last = mc[:, :, -1, 0] * spec[:, :, -2] + mc[:, :, -1, 1] * spec[:, :, -1]
    return jnp.concatenate([first[:, :, None], mid, last[:, :, None]], axis=2)


class BSRNN(nn.Module):
    """Complex spectrum [B, T, F=257] -> enhanced complex spectrum.

    ``causal=False`` reproduces the reference prototype exactly (offline:
    GroupNorm(1, C) reads the whole time axis). ``causal=True`` streams:
    cumulative norms + carried time-LSTM state, driven per-hop by
    StreamingEnhancer like every other causal family."""

    num_channel: int = 128
    num_layer: int = 6
    causal: bool = False

    def compress(self, mag: jax.Array) -> jax.Array:  # uniform model API
        return mag

    def init_state(self, batch_size: int):
        """Fresh streaming carry (causal variant only): per-norm cumulative
        (sum, power, count) triples + per-time-LSTM (h, c)."""
        assert self.causal, "only the causal BSRNN variant carries state"
        k, n = len(BAND_WIDTHS), self.num_channel

        def norm_carry():
            z = jnp.zeros((batch_size,), jnp.float32)
            return (z, z, z)

        def lstm_state():
            z = jnp.zeros((batch_size * k, 1, 2 * n), jnp.float32)
            return (z, z)

        return {
            "split": tuple(norm_carry() for _ in BAND_WIDTHS),
            "time_norm": tuple(norm_carry() for _ in range(self.num_layer)),
            "time_lstm": tuple(lstm_state() for _ in range(self.num_layer)),
            "band_norm": tuple(norm_carry() for _ in range(self.num_layer)),
            "dec": tuple(norm_carry() for _ in BAND_WIDTHS),
        }

    @nn.compact
    def __call__(self, spec: jax.Array, state=None, train: bool = False):
        if not jnp.iscomplexobj(spec):
            # accept stacked-RI input [B, T, F, 2] (the trainer adapter form)
            assert spec.shape[-1] == 2, spec.shape
            spec = jax.lax.complex(spec[..., 0], spec[..., 1])
        x_ri = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        causal = self.causal
        st = state if (causal and state is not None) else None

        def carry(key, i=None):
            if st is None:
                return None
            return st[key] if i is None else st[key][i]

        z, split_c = BandSplit(self.num_channel, causal=causal, name="band_split")(
            x_ri, carry("split"))  # [B, T, K, N]
        b, t, k, n = z.shape

        skip = z
        time_norm_c, time_lstm_c, band_norm_c = [], [], []
        for i in range(self.num_layer):
            if causal:
                out, c = _CausalNorm1(name=f"norm_t_{i}")(skip, carry("time_norm", i))
                time_norm_c.append(c)
            else:
                out = _GroupNorm1(name=f"norm_t_{i}")(skip)
            out = out.transpose(0, 2, 1, 3).reshape(b * k, t, n)
            out, lc = LSTM(2 * self.num_channel, name=f"lstm_t_{i}")(
                out, carry("time_lstm", i) if causal else None)
            if causal:
                time_lstm_c.append(lc)
            out = nn.Dense(self.num_channel, name=f"fc_t_{i}")(out)
            out = out.reshape(b, k, t, n).transpose(0, 2, 1, 3)
            skip = skip + out

        for i in range(self.num_layer):
            if causal:
                out, c = _CausalNorm1(name=f"norm_k_{i}")(skip, carry("band_norm", i))
                band_norm_c.append(c)
            else:
                out = _GroupNorm1(name=f"norm_k_{i}")(skip)
            # the band-axis LSTM runs over FREQUENCY bands within one frame
            # (non-causal over frequency is fine for streaming; no time state)
            out = out.reshape(b * t, k, n)
            out, _ = LSTM(2 * self.num_channel, bidirectional=True, name=f"lstm_k_{i}")(out)
            out = nn.Dense(self.num_channel, name=f"fc_k_{i}")(out)
            out = out.reshape(b, t, k, n)
            skip = skip + out

        m, dec_c = MaskDecoder(self.num_channel, causal=causal, name="mask_decoder")(
            skip, carry("dec"))
        new_state = (
            {
                "split": split_c,
                "time_norm": tuple(time_norm_c),
                "time_lstm": tuple(time_lstm_c),
                "band_norm": tuple(band_norm_c),
                "dec": dec_c,
            }
            if causal
            else None
        )
        return apply_three_tap_mask(spec, m), new_state


class LearnableSigmoid(nn.Module):
    """beta * sigmoid(slope * x), slope learnable (testBSRNN.py:8-16)."""

    features: int = 1
    beta: float = 1.2

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.ones_init(), (self.features,))
        return self.beta * jax.nn.sigmoid(slope * x)


class Discriminator(nn.Module):
    """MetricGAN discriminator on (clean_mag, est_mag) spectrogram pairs
    (testBSRNN.py:157-184). Input: two [B, T, F] mags -> quality in
    [0, beta]. Spectral norm on convs/denses, instance norm, PReLU."""

    ndf: int = 16

    @nn.compact
    def __call__(self, x_mag: jax.Array, y_mag: jax.Array, train: bool = False):
        x = jnp.stack([x_mag, y_mag], axis=-1)  # [B, T, F, 2]
        for i, mult in enumerate((1, 2, 4, 8)):
            ch = self.ndf * mult
            x = nn.SpectralNorm(
                nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False),
                name=f"conv_{i}",
            )(x, update_stats=train)
            # instance norm: per-channel spatial normalization
            mu = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            x = (x - mu) / jnp.sqrt(var + 1e-5)
            x = nn.PReLU()(x)
        x = jnp.max(x, axis=(1, 2))  # adaptive max pool -> [B, C]
        x = nn.SpectralNorm(nn.Dense(self.ndf * 4), name="fc1")(x, update_stats=train)
        x = nn.PReLU()(x)
        x = nn.SpectralNorm(nn.Dense(1), name="fc2")(x, update_stats=train)
        return LearnableSigmoid(1, name="lsig")(x)


def batch_quality_scores(clean_list, est_list, sr=16000):
    """MetricGAN target scores in [0, 1]: normalized PESQ -- the external
    package when available (testBSRNN.py:26-32), the native P.862 pipeline
    (metrics/pesq_native.py) otherwise."""
    try:
        from pesq import pesq as _pesq

        scores = []
        for c, e in zip(clean_list, est_list):
            try:
                scores.append((_pesq(sr, np.asarray(c), np.asarray(e), "wb") + 0.5) / 5.0)
            except Exception:
                return None
        return np.asarray(scores, np.float32)
    except ImportError:
        from cruse_tpu.metrics.pesq_native import wb_pesq_native

        return np.asarray(
            [(wb_pesq_native(c, e, sr) + 0.5) / 5.0 for c, e in zip(clean_list, est_list)],
            np.float32,
        )
