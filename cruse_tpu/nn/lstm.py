"""LSTM under `lax.scan`, torch-exact gate math (i, f, g, o ordering).

Same TPU design as the GRU: the input projection for all timesteps is one
einsum; the scan carries (h, c) and performs only the recurrent matmul.
Supports bidirectional operation (used by BSRNN's across-band LSTMs, where
"time" is the frequency-band axis -- non-causal by design).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from cruse_tpu.nn.gru import _uniform_init


def lstm_scan(x_proj, h0, c0, w_hh, b_hh, reverse=False, precision=None):
    """x_proj: [B, T, 4H] (input proj applied); w_hh: [4H, H]. Returns
    (y [B, T, H], (h, c))."""

    def step(carry, xp):
        h, c = carry
        hp = jnp.einsum("bh,kh->bk", h, w_hh, precision=precision) + b_hh
        gates = xp + hp
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    xs = jnp.swapaxes(x_proj, 0, 1)
    (h, c), ys = lax.scan(step, (h0, c0), xs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), (h, c)


class LSTM(nn.Module):
    """Single-layer (optionally bidirectional) LSTM, batch-first [B, T, I]."""

    hidden_size: int
    bidirectional: bool = False
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, state: Tuple[jax.Array, jax.Array] | None = None):
        b, t, i = x.shape
        h = self.hidden_size
        bound = 1.0 / (h**0.5)
        dirs = 2 if self.bidirectional else 1
        outs = []
        new_states = []
        for d in range(dirs):
            sfx = "" if d == 0 else "_reverse"
            w_ih = self.param(f"w_ih{sfx}", _uniform_init(bound), (4 * h, i))
            w_hh = self.param(f"w_hh{sfx}", _uniform_init(bound), (4 * h, h))
            b_ih = self.param(f"b_ih{sfx}", _uniform_init(bound), (4 * h,))
            b_hh = self.param(f"b_hh{sfx}", _uniform_init(bound), (4 * h,))
            if state is None:
                h0 = jnp.zeros((b, h), x.dtype)
                c0 = jnp.zeros((b, h), x.dtype)
            else:
                h0, c0 = state[0][:, d], state[1][:, d]
            x_proj = jnp.einsum("bti,ki->btk", x, w_ih, precision=self.precision) + b_ih
            y, (hn, cn) = lstm_scan(x_proj, h0, c0, w_hh, b_hh, reverse=d == 1,
                                    precision=self.precision)
            outs.append(y)
            new_states.append((hn, cn))
        y = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
        hs = jnp.stack([s[0] for s in new_states], axis=1)
        cs = jnp.stack([s[1] for s in new_states], axis=1)
        return y, (hs, cs)
