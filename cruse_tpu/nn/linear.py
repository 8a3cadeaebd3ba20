"""Grouped linear layers as einsums (one MXU contraction, no per-group loops).

Parity targets: GroupedLinearEinsum (cust_conv.py:503-542, kaiming-uniform
init, btgi,gih->btgh) and GroupedLinear with channel shuffle
(cust_conv.py:545-579).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


def kaiming_uniform_grouped(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_(a=sqrt(5)) on a [G, I, H] weight:
    fan_in = I (dim -2), gain = sqrt(2/(1+5)) -> bound = sqrt(3)*gain/sqrt(fan_in)."""
    fan_in = shape[-2]
    gain = (2.0 / (1.0 + 5.0)) ** 0.5
    bound = (3.0**0.5) * gain / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class GroupedLinear(nn.Module):
    """[..., T, I] -> [..., T, H] via per-group weights [G, I/G, H/G].

    No bias (matches GroupedLinearEinsum). Optional channel shuffle on the
    output (matches the looped GroupedLinear variant when enabled).
    """

    hidden_size: int
    groups: int = 1
    shuffle: bool = False
    use_bias: bool = False
    precision: Optional[lax.Precision] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        *lead, i_total = x.shape
        g = self.groups
        assert i_total % g == 0, f"{i_total} % {g}"
        assert self.hidden_size % g == 0
        i, h = i_total // g, self.hidden_size // g
        w = self.param("weight", kaiming_uniform_grouped, (g, i, h))
        xg = x.reshape(*lead, g, i)
        y = jnp.einsum("...gi,gih->...gh", xg, w, precision=self.precision)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), (g, h))
            y = y + b
        y = y.reshape(*lead, g * h)
        if self.shuffle and g > 1:
            from cruse_tpu.nn.gru import channel_shuffle

            y = channel_shuffle(y, g)
        return y
