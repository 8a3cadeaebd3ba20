"""Grouped GRU stacks under `lax.scan` (TPU-native recurrence).

Design: the input projection for ALL timesteps and ALL groups is one batched
einsum (MXU-friendly, grows with T); the scan body carries only the [B, G, H]
hidden state and performs the small recurrent matmul per step. Gate order and
equations match ``torch.nn.GRU`` (r, z, n) so golden parity tests against the
reference's grouped-GRU modules (model/based_model/cust_conv.py:250-416,
model/cruse_net.py:14-55) are exact.

Streaming: every layer takes/returns an explicit hidden-state carry; calling
with T=1 is the per-frame streaming step.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def gru_scan(x_proj: jax.Array, h0: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
             precision=None):
    """Run the GRU recurrence given precomputed input projections.

    x_proj: [B, T, G, 3H] (input-to-hidden already applied)
    h0:     [B, G, H]
    w_hh:   [G, 3H, H], b_hh: [G, 3H]
    Returns (y [B, T, G, H], h_last [B, G, H]).
    """
    h_dim = h0.shape[-1]

    def step(h, xp):
        hp = jnp.einsum("bgh,gkh->bgk", h, w_hh, precision=precision) + b_hh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last


class GroupedGRULayer(nn.Module):
    """G independent per-group GRUs over feature slices, outputs concatenated.

    Input  [B, T, I] (I divisible by groups) -> output [B, T, H] where each
    group's GRU maps I/G -> H/G (cust_conv.py:250-325 semantics).
    """

    hidden_size: int
    groups: int = 1
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, h0: jax.Array | None = None):
        b, t, i_total = x.shape
        g = self.groups
        assert i_total % g == 0 and self.hidden_size % g == 0
        i, h = i_total // g, self.hidden_size // g
        bound = 1.0 / (h**0.5)
        w_ih = self.param("w_ih", _uniform_init(bound), (g, 3 * h, i))
        w_hh = self.param("w_hh", _uniform_init(bound), (g, 3 * h, h))
        b_ih = self.param("b_ih", _uniform_init(bound), (g, 3 * h))
        b_hh = self.param("b_hh", _uniform_init(bound), (g, 3 * h))
        if h0 is None:
            h0 = self.init_state(b, x.dtype)
        xg = x.reshape(b, t, g, i)
        x_proj = jnp.einsum("btgi,gki->btgk", xg, w_ih, precision=self.precision) + b_ih
        y, h_last = gru_scan(x_proj, h0, w_hh, b_hh, self.precision)
        return y.reshape(b, t, g * h), h_last

    def init_state(self, batch_size: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros((batch_size, self.groups, self.hidden_size // self.groups), dtype)


class GRU(nn.Module):
    """Plain single-layer GRU (torch.nn.GRU equations), groups == 1."""

    hidden_size: int
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, h0: jax.Array | None = None):
        layer = GroupedGRULayer(self.hidden_size, 1, self.precision, name="layer")
        y, h = layer(x, None if h0 is None else h0[:, None, :])
        return y, h[:, 0, :]


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """[..., G*H] concat layout -> interleaved layout (index h*G + g).

    Equivalent of the reference's stack/flatten inter-group mixing
    (cruse_net.py:43-45) and GroupGRU's shuffle (cust_conv.py:408-410).
    """
    *lead, f = x.shape
    h = f // groups
    return jnp.swapaxes(x.reshape(*lead, groups, h), -1, -2).reshape(*lead, f)


class GroupedGRU(nn.Module):
    """Multi-layer grouped GRU with inter-layer channel shuffle
    (cust_conv.py:328-416). Optional summed outputs across layers."""

    hidden_size: int
    num_layers: int = 1
    groups: int = 4
    shuffle: bool = True
    add_outputs: bool = False
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, state: jax.Array | None = None):
        g = self.groups
        shuffle = self.shuffle and g > 1
        if state is None:
            state = self.init_state(x.shape[0], x.dtype)
        out_sum = 0.0
        out = x
        new_states = []
        for li in range(self.num_layers):
            layer = GroupedGRULayer(self.hidden_size, g, self.precision, name=f"layer_{li}")
            out, h = layer(out, state[:, li])
            new_states.append(h)
            if shuffle and li < self.num_layers - 1:
                out = channel_shuffle(out, g)
            if self.add_outputs:
                out_sum = out_sum + out
        y = out_sum if self.add_outputs else out
        return y, jnp.stack(new_states, axis=1)  # [B, L, G, H]

    def init_state(self, batch_size: int, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros(
            (batch_size, self.num_layers, self.groups, self.hidden_size // self.groups), dtype
        )


class GGRUBottleneck(nn.Module):
    """CRUSE bottleneck: two grouped-GRU banks with LayerNorm after each and
    stack-interleave mixing between them (cruse_net.py:14-55 intended
    semantics, repaired per SURVEY.md §2.9).

    Input [B, T, D]; D divisible by groups. Returns (y [B, T, D], state).
    """

    groups: int = 2
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, state=None):
        d = x.shape[-1]
        g = self.groups
        if state is None:
            state = self.init_state(x.shape[0], d, x.dtype)
        h1, h2 = state
        bank1 = GroupedGRULayer(d, g, self.precision, name="bank1")
        bank2 = GroupedGRULayer(d, g, self.precision, name="bank2")
        out, h1n = bank1(x, h1)
        # reference mixing: stack group outputs on a new trailing axis then
        # flatten -> index h*G+g (interleave)
        out = channel_shuffle(out, g)
        out = nn.LayerNorm(epsilon=1e-5, name="ln1")(out)
        out, h2n = bank2(out, h2)
        out = nn.LayerNorm(epsilon=1e-5, name="ln2")(out)
        return out, (h1n, h2n)

    def init_state(self, batch_size: int, d: int, dtype=jnp.float32):
        shape = (batch_size, self.groups, d // self.groups)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


class SqueezedGRU(nn.Module):
    """Grouped-linear in -> GRU -> grouped-linear out, optional skip
    (cust_conv.py:419-500). ``skip_post`` selects the `_S` variant where the
    skip is added after linear_out from the raw input."""

    hidden_size: int
    output_size: Optional[int] = None
    linear_groups: int = 8
    skip: bool = False
    skip_post: bool = False
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array, h0: jax.Array | None = None):
        from cruse_tpu.nn.linear import GroupedLinear

        inp = x
        x = GroupedLinear(self.hidden_size, self.linear_groups, name="linear_in")(x)
        lin_in_out = x
        y, h = GRU(self.hidden_size, self.precision, name="gru")(x, h0)
        if self.skip and not self.skip_post:
            y = y + lin_in_out
        out_size = self.output_size
        if out_size is not None:
            y = GroupedLinear(out_size, self.linear_groups, name="linear_out")(y)
        if self.skip and self.skip_post:
            y = y + inp
        return y, h
